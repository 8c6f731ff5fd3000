"""End-to-end DCAE model tests on a tiny config: forward contract, real
bitstream round-trip (the project's core correctness property), and
forward/codec consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcae_tpu.config import DCAEConfig
from dcae_tpu.models import DCAE, DCAECodec


@pytest.fixture(scope="module")
def tiny_codec():
    cfg = DCAEConfig.tiny()
    codec = DCAECodec(cfg, seed=0)
    codec.update(force=True)
    return codec


@pytest.fixture(scope="module")
def image(tiny_codec):
    rng = np.random.default_rng(100)
    p = tiny_codec.cfg.pad_multiple
    # smooth-ish synthetic image in [0,1]
    base = rng.uniform(0, 1, (1, p // 8, p // 8, 3))
    img = np.kron(base, np.ones((1, 8, 8, 1)))
    img += rng.normal(0, 0.02, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)


class TestForward:
    def test_output_contract(self, tiny_codec, image):
        out = tiny_codec.forward(image)
        cfg = tiny_codec.cfg
        B, H, W, _ = image.shape
        assert out["x_hat"].shape == image.shape
        assert out["likelihoods"]["y"].shape == (B, H // 16, W // 16, cfg.M)
        assert out["likelihoods"]["z"].shape == (
            B, H // 64, W // 64, cfg.eb_channels)
        assert out["para"]["means"].shape == out["para"]["scales"].shape
        for v in jax.tree.leaves(out):
            assert np.all(np.isfinite(np.asarray(v)))
        like = np.asarray(out["likelihoods"]["y"])
        assert np.all(like > 0) and np.all(like <= 1)

    def test_training_forward_differs_by_noise(self, tiny_codec, image):
        model = tiny_codec.model
        params = tiny_codec.params
        out1 = model.apply({"params": params}, jnp.asarray(image),
                           training=True,
                           rngs={"noise": jax.random.PRNGKey(1)})
        out2 = model.apply({"params": params}, jnp.asarray(image),
                           training=True,
                           rngs={"noise": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(out1["likelihoods"]["y"]),
                               np.asarray(out2["likelihoods"]["y"]))

    @pytest.mark.slow  # 60s+ of grad-graph compile; deep check, --runslow
    def test_grads_flow_everywhere(self, tiny_codec, image):
        """RD loss must reach analysis, synthesis, hyper, dictionary and
        context nets (find_unused_parameters must never be needed)."""
        model = tiny_codec.model
        # at init medians==0 makes z_hat exactly zero (round of small z), so
        # hyper-synthesis kernels would see zero input; shift the medians to
        # exercise the real training regime
        params = jax.tree_util.tree_map_with_path(
            lambda kp, v: v + 0.3
            if "quantiles" in jax.tree_util.keystr(kp) else v,
            tiny_codec.params)

        def loss(p):
            out = model.apply({"params": p}, jnp.asarray(image),
                              training=True,
                              rngs={"noise": jax.random.PRNGKey(0)})
            mse = jnp.mean((out["x_hat"] - image) ** 2)
            bpp = sum(-jnp.log2(l).sum()
                      for l in jax.tree.leaves(out["likelihoods"]))
            return 255 ** 2 * 0.013 * mse + bpp / image[0, :, :, 0].size

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        zero = [jax.tree_util.keystr(k) for k, g in flat
                if not np.any(np.asarray(g) != 0)]
        # quantiles are trained by the aux loss only
        zero = [k for k in zero if "quantiles" not in k]
        assert zero == [], f"dead params: {zero[:10]}"


class TestRealCodec:
    def test_round_trip_matches_forward(self, tiny_codec, image):
        out_enc = tiny_codec.compress(image)
        assert len(out_enc["strings"]) == 2
        assert all(isinstance(s, bytes) for grp in out_enc["strings"]
                   for s in grp)
        out_dec = tiny_codec.decompress(out_enc["strings"], out_enc["shape"])
        x_hat = np.asarray(out_dec["x_hat"])
        assert x_hat.shape == image.shape
        assert np.all(x_hat >= 0) and np.all(x_hat <= 1)

        # decompress must reproduce the eval-forward reconstruction exactly
        # (same quantized latents through the same synthesis graph)
        fwd = np.clip(np.asarray(tiny_codec.forward(image)["x_hat"]), 0, 1)
        np.testing.assert_allclose(x_hat, fwd, atol=1e-5)

    def test_real_bpp_close_to_likelihood_bpp(self, tiny_codec, image):
        out = tiny_codec.forward(image)
        num_pixels = image.shape[1] * image.shape[2]
        est = sum(float(-jnp.log2(l).sum())
                  for l in jax.tree.leaves(out["likelihoods"])) / num_pixels
        enc = tiny_codec.compress(image)
        real = sum(len(s) * 8 for grp in enc["strings"]
                   for s in grp) / num_pixels
        # real rate must be within ~12% + small constant of the estimate
        assert real < est * 1.12 + 64 * 8 / num_pixels, (real, est)

    def test_deterministic_streams(self, tiny_codec, image):
        a = tiny_codec.compress(image)
        b = tiny_codec.compress(image)
        for ga, gb in zip(a["strings"], b["strings"]):
            assert ga == gb

    def test_batched_compress(self, tiny_codec, image):
        batch = np.concatenate([image, 1.0 - image], axis=0)
        enc = tiny_codec.compress(batch)
        assert len(enc["strings"][0]) == 2 and len(enc["strings"][1]) == 2
        dec = tiny_codec.decompress(enc["strings"], enc["shape"])
        assert np.asarray(dec["x_hat"]).shape == batch.shape
        # each image's stream decodes independently of the batch
        enc_single = tiny_codec.compress(image)
        assert enc_single["strings"][0][0] == enc["strings"][0][0]
        assert enc_single["strings"][1][0] == enc["strings"][1][0]

    def test_pack_unpack_inverses(self):
        """Host unpackers invert the device-side int4/6-bit packs
        (dcae.encode_rest) bit-exactly."""
        from dcae_tpu.models.codec import _unpack_idx6, _unpack_sym4
        rng = np.random.default_rng(1)
        sym = rng.integers(-8, 8, (5, 2, 3, 4, 8)).astype(np.int32)
        nib = (sym & 0xF).astype(np.uint8)
        packed = nib[..., 0::2] | (nib[..., 1::2] << 4)
        assert (_unpack_sym4(packed).astype(np.int32) == sym).all()
        idx = rng.integers(0, 64, (5, 2, 3, 4, 8)).astype(np.uint8)
        g = idx.astype(np.uint32).reshape(*idx.shape[:-1], -1, 4)
        w = (g[..., 0] | (g[..., 1] << 6) | (g[..., 2] << 12)
             | (g[..., 3] << 18))
        p6 = np.stack([w & 255, (w >> 8) & 255, (w >> 16) & 255],
                      axis=-1).astype(np.uint8).reshape(*idx.shape[:-1], -1)
        assert (_unpack_idx6(p6, 8) == idx).all()

    @staticmethod
    def _handoff_dict(y_sym, y_idx, z_sym):
        """Build the encode_rest/narrow_z hand-off leaves from int32
        symbol tensors (numpy mirror of the device-side emission)."""
        sd = y_sym.shape[-1]
        nib = (y_sym & 0xF).astype(np.uint8)
        g = y_idx.astype(np.uint32).reshape(*y_idx.shape[:-1], sd // 4, 4)
        w = (g[..., 0] | (g[..., 1] << 6) | (g[..., 2] << 12)
             | (g[..., 3] << 18))
        return {
            "y_symbols": y_sym,
            "y_symbols16": y_sym.astype(np.int16),
            "y_symbols8": y_sym.astype(np.int8),
            "y_overflow": np.any(np.abs(y_sym) > 32767),
            "y_overflow8": np.any(np.abs(y_sym) > 127),
            "y_overflow4": np.any((y_sym < -8) | (y_sym > 7)),
            "y_packed4": nib[..., 0::2] | (nib[..., 1::2] << 4),
            "y_indexes": y_idx,
            "y_indexes_p6": np.stack(
                [w & 255, (w >> 8) & 255, (w >> 16) & 255],
                axis=-1).astype(np.uint8).reshape(
                    *y_idx.shape[:-1], sd // 4 * 3),
            "z_symbols": z_sym,
            "z_symbols8": z_sym.astype(np.int8),
            "z_overflow8": np.any(np.abs(z_sym) > 127),
        }

    def test_overflow_tier_fallback_and_recovery(self, tiny_codec):
        """A symbol outside [-8,7] must route _finish_fused to a wider
        fetch tier with an identical stream, downgrade the sticky tier,
        and recover on the next in-range batch."""
        from dcae_tpu.entropy import rans
        cfg = tiny_codec.cfg
        t = tiny_codec.tables
        rng = np.random.default_rng(0)
        S, B, h, w, sd = cfg.num_slices, 1, 2, 2, cfg.slice_dim
        y_idx = rng.integers(
            0, t.gaussian.quantized_cdf.shape[0],
            (S, B, h, w, sd)).astype(np.uint8)
        z_sym = rng.integers(-3, 4, (B, 2, 2, cfg.eb_channels)).astype(
            np.int32)

        def roundtrip(y_sym):
            enc = tiny_codec._finish_fused(
                self._handoff_dict(y_sym, y_idx, z_sym))
            flat_idx = np.concatenate(
                [y_idx[s, 0].transpose(2, 0, 1).reshape(-1)
                 for s in range(S)])
            dec = rans.decode_with_indexes(
                enc["strings"][0][0], flat_idx.astype(np.int32),
                t.gaussian.quantized_cdf, t.gaussian.cdf_length,
                t.gaussian.offset)
            want = np.concatenate(
                [y_sym[s, 0].transpose(2, 0, 1).reshape(-1)
                 for s in range(S)])
            assert (np.asarray(dec, np.int32) == want).all()

        in_range = rng.integers(-5, 6, (S, B, h, w, sd)).astype(np.int32)
        overflow = in_range.copy()
        overflow[0, 0, 0, 0, 0] = 20  # breaks int4, fits int8

        assert tiny_codec._sym_tier4 is True
        roundtrip(overflow)
        assert tiny_codec._sym_tier4 is False  # downgraded
        roundtrip(in_range)
        assert tiny_codec._sym_tier4 is True  # recovered

    def test_uint8_ingress_matches_f32(self, tiny_codec, image):
        """compress() accepts uint8 images (normalized on device; 4x less
        h2d). Streams must bit-match the f32 ingress of the same
        quantized pixels — the division is IEEE f32 either way."""
        u8 = (image * 255).round().astype(np.uint8)
        f32 = u8.astype(np.float32) / np.float32(255.0)
        enc8 = tiny_codec.compress(u8)
        enc32 = tiny_codec.compress(f32)
        assert enc8["strings"] == enc32["strings"]
        dec = tiny_codec.decompress(enc8["strings"], enc8["shape"])
        assert np.isfinite(np.asarray(dec["x_hat"])).all()

    def test_uint8_ingress_all_encode_entry_points(self, tiny_codec, image):
        """Every encode entry point must normalize uint8 identically —
        compress_with_indexes and compress_many(pipeline=True) previously
        bypassed _as_input and encoded 0..255-scaled garbage."""
        u8 = (image * 255).round().astype(np.uint8)
        want = tiny_codec.compress(u8, mode="fused")["strings"]
        got = tiny_codec.compress_with_indexes(u8)
        assert got["strings"] == want
        many = tiny_codec.compress_many([u8], fused=True, pipeline=True)
        assert many[0]["strings"] == want

    def test_encdec_pipeline_matches_sequential(self, tiny_codec, image):
        """The overlapped serving loop must produce exactly the streams and
        reconstructions the sequential compress->decompress path does —
        including with a trailing group smaller than decode_interleave."""
        batches = [np.concatenate([image, 1.0 - image], axis=0),
                   np.clip(image * 0.5 + 0.25, 0, 1),
                   np.clip(1.0 - image * 0.75, 0, 1)]
        out = tiny_codec.encdec_pipeline(batches, decode_interleave=2)
        assert len(out) == len(batches)
        for x, r in zip(batches, out):
            enc = tiny_codec.compress(x)
            assert r["strings"] == enc["strings"]
            dec = tiny_codec.decompress(enc["strings"], enc["shape"])
            # interleaved decode drives the same per-batch programs, so
            # reconstructions are bitwise equal to the sequential path
            np.testing.assert_array_equal(np.asarray(r["x_hat"]),
                                          np.asarray(dec["x_hat"]))

    def test_staged_and_fused_encoders_agree(self, tiny_codec, image):
        """The staged encoder (decoder-program replay) and the fused
        single-program encoder must emit identical streams; self_check
        then enables the fused fast path."""
        staged = tiny_codec.compress(image, fused=False)
        fused = tiny_codec.compress(image, fused=True)
        assert staged["strings"] == fused["strings"]
        assert tiny_codec.self_check(image) is True
        assert tiny_codec.encode_mode in ("fused", "split")

    def test_split_encoder_agrees(self, tiny_codec, image):
        """The 2-call split encoder (analysis, then one fused slice-context
        program) must also emit the staged stream — it's the bit-safe fast
        path when the analysis transforms run reduced precision."""
        staged = tiny_codec.compress(image, mode="staged")
        split = tiny_codec.compress(image, mode="split")
        assert staged["strings"] == split["strings"]

    def test_bfloat16_codec_round_trip(self, image):
        """bf16 analysis/synthesis bodies (entropy-side nets stay f32):
        compressed streams still decode to the forward reconstruction."""
        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.models.codec import DCAECodec

        cfg = DCAEConfig.tiny(compute_dtype="bfloat16")
        codec = DCAECodec(cfg, seed=0)
        codec.update(force=True)
        codec.self_check(image)
        enc = codec.compress(image)
        dec = codec.decompress(enc["strings"], enc["shape"])
        x_hat = np.asarray(dec["x_hat"])
        # the f32 entropy path makes y_hat identical in both graphs; only
        # the bf16 g_s body may round differently across programs, so the
        # tolerance is bf16-scale rather than the f32 test's 1e-5
        fwd = np.clip(np.asarray(codec.forward(image)["x_hat"]), 0, 1)
        np.testing.assert_allclose(x_hat, fwd, atol=2e-2)

    def test_decompress_many_interleaved(self, tiny_codec, image):
        """Interleaved multi-job decode must equal per-job decode."""
        imgs = [image, np.clip(1.0 - image, 0, 1)]
        encs = codec_encs = [tiny_codec.compress(x) for x in imgs]
        want = [np.asarray(tiny_codec.decompress(e["strings"],
                                                 e["shape"])["x_hat"])
                for e in encs]
        got = tiny_codec.decompress_many(
            [(e["strings"], e["shape"]) for e in codec_encs])
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(g["x_hat"]), w, atol=1e-6)

    def test_update_required(self):
        codec = DCAECodec(DCAEConfig.tiny(), seed=1)
        with pytest.raises(RuntimeError):
            codec.compress(np.zeros((1, 64, 64, 3), np.float32))


class TestRoundtripSelfCheck:
    def test_roundtrip_check_passes_both_modes(self, tiny_codec, image):
        """Criterion-2 self_check (decode-replay exactness): both fast
        encoder modes must produce streams the staged decoder programs
        decode back to the encoder's exact (indexes, symbols)."""
        assert tiny_codec._roundtrip_check(image, mode="fused") is True
        assert tiny_codec._roundtrip_check(image, mode="split") is True

    def test_prefer_fused_env(self, tiny_codec, image, monkeypatch):
        monkeypatch.setenv("DCAE_PREFER_FUSED", "1")
        assert tiny_codec.self_check(image) is True
        assert tiny_codec.encode_mode == "fused"

    def test_roundtrip_fallback_when_stream_equality_fails(
            self, tiny_codec, image, monkeypatch):
        """When no mode bit-matches the staged stream (simulated by
        perturbing the staged result), self_check must fall back to the
        decode-replay criterion and still enable the fused encoder."""
        orig = tiny_codec.compress

        def fake(x, mode=None, fused=None):
            out = orig(x, mode=mode, fused=fused)
            if mode == "staged":
                out = {**out, "strings": [
                    out["strings"][0],
                    [s + b"X" for s in out["strings"][1]]]}
            return out

        monkeypatch.setattr(tiny_codec, "compress", fake)
        for env in (None, "1"):
            if env is None:
                monkeypatch.delenv("DCAE_PREFER_FUSED", raising=False)
            else:
                monkeypatch.setenv("DCAE_PREFER_FUSED", env)
            tiny_codec.encode_mode = "staged"
            assert tiny_codec.self_check(image) is True
            assert tiny_codec.encode_mode == "fused"


class TestPipelineFailurePaths:
    def test_consumer_failure_does_not_hang(self, tiny_codec, image,
                                            monkeypatch):
        """A decode-side exception must propagate out of encdec_pipeline
        promptly (the producer must not stay blocked on the bounded
        queue)."""
        def boom(*a, **k):
            raise RuntimeError("decode died")

        monkeypatch.setattr(tiny_codec, "decompress_many", boom)
        monkeypatch.setattr(tiny_codec, "decompress", boom)
        batches = [image] * 6
        with pytest.raises(RuntimeError, match="decode died"):
            tiny_codec.encdec_pipeline(batches, decode_interleave=2)

    def test_producer_failure_propagates(self, tiny_codec, image,
                                         monkeypatch):
        """A compress-side exception must surface in the caller, not die
        silently in the producer thread."""
        def boom(*a, **k):
            raise RuntimeError("encode died")

        monkeypatch.setattr(tiny_codec, "compress", boom)
        with pytest.raises(RuntimeError, match="encode died"):
            tiny_codec.encdec_pipeline([image] * 3, decode_interleave=2)
