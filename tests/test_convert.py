"""Checkpoint converter tests: export to the reference torch layout and
re-import must be an exact identity over the whole parameter tree (catches
any naming/transform asymmetry in either direction)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcae_tpu.config import DCAEConfig
from dcae_tpu.models.dcae import DCAE
from dcae_tpu.utils.convert import (convert_reference_state_dict,
                                    export_reference_state_dict,
                                    validate_converted)


@pytest.fixture(scope="module")
def tree():
    # block_num includes a >=4 even stage so the scanned-pairs path is
    # exercised by the round trip
    cfg = DCAEConfig.tiny(block_num=(1, 2, 4))
    model = DCAE(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, cfg.pad_multiple, cfg.pad_multiple, 3)),
        training=False)["params"]
    return cfg, jax.tree.map(np.asarray, params)


def test_export_import_round_trip(tree):
    cfg, params = tree
    sd = export_reference_state_dict(params, cfg)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    # every reference key family is present
    for key in ("g_a.0.conv.weight", "g_s.6.conv.weight", "h_a.2.weight",
                "h_z_s1.1.layers.0.msa.embedding_layer.weight", "dt",
                "dt_cross_attention.0.x_trans.weight",
                "cc_mean_transforms.4.4.bias",
                "lrp_transforms.0.0.weight",
                "entropy_bottleneck._matrix0",
                "entropy_bottleneck.quantiles",
                "g_a.5.layers.3.mlp.fc1.weight"):  # scanned pair, SW block
        assert key in sd, key

    back = convert_reference_state_dict(sd, cfg)
    problems = validate_converted(back, params)
    assert problems == [], problems[:10]
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for k, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[k]),
            err_msg=jax.tree_util.keystr(k))


def test_real_torch_checkpoint_file_round_trip(tree, tmp_path):
    """Parse an ACTUAL torch.save artifact (not an in-memory dict): the
    reference's training checkpoint container {'epoch', 'state_dict'} with
    DDP 'module.' prefixes (ref train.py:461-463,498-511), through
    load_torch_state_dict + the converter, must reproduce the source tree
    exactly (exact tree equality subsumes forward parity, which
    tests/test_reference_parity.py separately proves for this export)."""
    torch = pytest.importorskip("torch")
    cfg, params = tree
    sd = export_reference_state_dict(params, cfg)
    blob = {
        "epoch": 7,
        "loss": 1.25,
        "state_dict": {f"module.{k}": torch.from_numpy(
            np.ascontiguousarray(v)) for k, v in sd.items()},
        "optimizer": {"state": {}, "param_groups": []},
    }
    path = tmp_path / "checkpoint_best_loss.pth.tar"
    torch.save(blob, str(path))

    from dcae_tpu.utils.convert import load_torch_state_dict
    loaded = load_torch_state_dict(str(path))
    assert set(loaded) == set(sd)  # module. prefixes stripped
    back = convert_reference_state_dict(loaded, cfg)
    assert validate_converted(back, params) == []
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[k]),
                                      err_msg=jax.tree_util.keystr(k))


def test_real_torch_split_checkpoint_file(tree, tmp_path):
    """dcae_7-style split checkpoint as a real torch.save file:
    compress_model./decompress_model. prefixes with the shared modules
    duplicated on both sides (ref models/dcae_7.py:773-819)."""
    torch = pytest.importorskip("torch")
    cfg, params = tree
    sd = export_reference_state_dict(params, cfg)
    split = {}
    for k, v in sd.items():
        t = torch.from_numpy(np.ascontiguousarray(v))
        if k.startswith("g_s."):
            split[f"decompress_model.{k}"] = t
        else:
            split[f"compress_model.{k}"] = t
            if k.startswith(("h_z_s", "dt", "cc_", "lrp_",
                             "entropy_bottleneck")):
                split[f"decompress_model.{k}"] = t
    path = tmp_path / "split.pth"
    torch.save({"state_dict": split}, str(path))

    from dcae_tpu.utils.convert import load_torch_state_dict
    back = convert_reference_state_dict(load_torch_state_dict(str(path)),
                                        cfg)
    assert validate_converted(back, params) == []


def test_split_prefix_checkpoints_collapse(tree):
    """dcae_7-style split checkpoints (compress_model./decompress_model.
    prefixes with duplicated shared modules) load into the flat tree."""
    cfg, params = tree
    sd = export_reference_state_dict(params, cfg)
    split_sd = {}
    dec_only = ("g_s.",)
    for k, v in sd.items():
        if k.startswith(dec_only):
            split_sd[f"decompress_model.{k}"] = v
        else:
            split_sd[f"compress_model.{k}"] = v
            if k.startswith(("h_z_s", "dt", "cc_", "lrp_",
                             "entropy_bottleneck")):
                split_sd[f"decompress_model.{k}"] = v  # duplicated shared
    back = convert_reference_state_dict(split_sd, cfg)
    assert validate_converted(back, params) == []
