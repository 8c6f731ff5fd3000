"""Split-codec tests: param partition, encoder-half/decoder-half round trip
equal to the joint codec, ParameterSync shipping, autoencoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcae_tpu.config import DCAEConfig
from dcae_tpu.models import DCAECodec
from dcae_tpu.models.autoencoder import (SimpleAutoencoder,
                                         compression_ratio,
                                         params_from_dcae)
from dcae_tpu.models.split import (COMPRESS_ONLY, DECOMPRESS_ONLY,
                                   ParameterSync, compress_params,
                                   decompress_params, make_split_pair,
                                   shared_param_keys)


@pytest.fixture(scope="module")
def joint():
    cfg = DCAEConfig.tiny()
    codec = DCAECodec(cfg, seed=0)
    codec.update(force=True)
    return codec


@pytest.fixture(scope="module")
def image(joint):
    rng = np.random.default_rng(100)
    p = joint.cfg.pad_multiple
    base = rng.uniform(0, 1, (1, p // 8, p // 8, 3))
    img = np.kron(base, np.ones((1, 8, 8, 1)))
    return np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(
        np.float32)


class TestPartition:
    def test_subtree_split(self, joint):
        p = joint.params
        cp = compress_params(p)
        dp = decompress_params(p)
        assert "g_s" not in cp and "g_a" in cp and "h_a" in cp
        assert "g_a" not in dp and "h_a" not in dp and "g_s" in dp
        shared = shared_param_keys(p)
        assert "entropy_bottleneck" in shared and "dt" in shared
        assert all(k in cp and k in dp for k in shared)
        assert not (set(COMPRESS_ONLY) & set(DECOMPRESS_ONLY))

    def test_split_halves_match_joint(self, joint, image):
        enc, dec = make_split_pair(joint.cfg, joint.params)
        out_enc = enc.compress(image)
        joint_enc = joint.compress(image)
        # identical bitstreams from the encoder half vs the joint codec
        assert out_enc["strings"] == joint_enc["strings"]
        out_dec = dec.decompress(out_enc["strings"], out_enc["shape"])
        joint_dec = joint.decompress(joint_enc["strings"],
                                     joint_enc["shape"])
        np.testing.assert_allclose(np.asarray(out_dec["x_hat"]),
                                   np.asarray(joint_dec["x_hat"]),
                                   atol=1e-6)

    def test_parameter_sync_round_trip(self, joint, tmp_path):
        path = str(tmp_path / "shared.msgpack")
        ParameterSync.save_shared_parameters(joint.params, path)
        # corrupt the shared subtree, then restore from the shipped file
        mutated = jax.tree.map(lambda x: x * 0.0,
                               ParameterSync.extract_shared(joint.params))
        broken = ParameterSync.inject_shared(joint.params, mutated)
        restored = ParameterSync.load_shared_parameters(broken, path)
        for a, b in zip(
                jax.tree.leaves(ParameterSync.extract_shared(joint.params)),
                jax.tree.leaves(ParameterSync.extract_shared(restored))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAutoencoder:
    def test_forward_and_latent_round_trip(self, joint, image):
        cfg = joint.cfg
        model = SimpleAutoencoder(cfg)
        params = params_from_dcae(joint.params)
        out = model.apply({"params": params}, jnp.asarray(image))
        assert out["x_hat"].shape == image.shape
        assert out["y"].shape == (1, image.shape[1] // 16,
                                  image.shape[2] // 16, cfg.M)
        y = model.apply({"params": params}, jnp.asarray(image),
                        method=SimpleAutoencoder.compress)
        x_hat = model.apply({"params": params}, y,
                            method=SimpleAutoencoder.decompress)
        np.testing.assert_allclose(
            np.asarray(x_hat),
            np.clip(np.asarray(out["x_hat"]), 0, 1), atol=1e-6)

    def test_compression_ratio(self):
        cfg = DCAEConfig()  # M=320: 16*16*3 / (320*4)
        assert abs(compression_ratio(cfg) - 0.6) < 1e-9
