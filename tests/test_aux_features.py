"""Tests for auxiliary capabilities: latent-handoff codec, size analysis,
BD-rate math, golden RD tables, metric logging, drift-diff harness."""

import json
import os

import numpy as np
import pytest

from dcae_tpu.data import rd_reference
from dcae_tpu.utils.logging import MetricLogger


class TestBDRate:
    def test_identical_curves_zero(self):
        bpp = [0.8, 0.4, 0.2, 0.1]
        psnr = [38.0, 35.0, 32.0, 29.0]
        assert abs(rd_reference.bd_rate(bpp, psnr, bpp, psnr)) < 1e-9

    def test_half_rate_is_minus_fifty(self):
        bpp = np.array([0.8, 0.4, 0.2, 0.1])
        psnr = [38.0, 35.0, 32.0, 29.0]
        got = rd_reference.bd_rate(bpp, psnr, bpp / 2, psnr)
        assert abs(got - (-50.0)) < 1e-6

    def test_disjoint_quality_ranges_rejected(self):
        # measured points from the round-3 sweep (docs/RD_VALIDATION.md):
        # training moved the whole curve ~0.8 dB up between epochs 80 and
        # 120, so the quality ranges do not overlap and BD-rate must
        # refuse rather than extrapolate
        with pytest.raises(ValueError, match="overlap"):
            rd_reference.bd_rate([0.0781, 0.1255, 0.1362],
                                 [24.68, 25.11, 25.14],
                                 [0.0747, 0.1299, 0.1411],
                                 [25.39, 25.90, 25.89])

    def test_golden_tables_shape(self):
        for name, t in rd_reference.REFERENCE_RD.items():
            assert len(t["bpp"]) == 6, name
        assert len(rd_reference.MSE_LAMBDAS) == 6
        # self-comparison is ~0
        assert abs(rd_reference.compare_to_reference(
            "Kodak", rd_reference.REFERENCE_RD["Kodak"]["bpp"],
            rd_reference.REFERENCE_RD["Kodak"]["psnr"])) < 1e-9


class TestMetricLogger:
    def test_jsonl_sink(self, tmp_path):
        logger = MetricLogger(str(tmp_path), run_name="t")
        logger.log(0, {"loss": 1.5, "bpp_loss": 0.2})
        logger.log(100, {"loss": 1.0}, namespace="val")
        logger.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "t.jsonl").read().splitlines()]
        assert lines[0]["loss"] == 1.5 and lines[0]["ns"] == "train"
        assert lines[1]["ns"] == "val" and lines[1]["step"] == 100

    def test_tensorboard_sink(self, tmp_path):
        """The TensorBoard scalar writer (ref train.py:401,488) attaches
        when the package is importable — in this image it is, so an
        events file must appear next to the JSONL."""
        import os

        logger = MetricLogger(str(tmp_path), run_name="t")
        if logger._tb is None:
            pytest.skip("tensorboard not importable in this environment")
        logger.log(0, {"loss": 1.5})
        logger.close()
        tb_files = os.listdir(tmp_path / "tb")
        assert any(f.startswith("events.out.tfevents") for f in tb_files)


class TestLatentHandoff:
    @pytest.fixture(scope="class")
    def codec(self):
        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.models import DCAECodec

        c = DCAECodec(DCAEConfig.tiny(), seed=0)
        c.update(force=True)
        return c

    def test_latent_round_trip(self, codec):
        rng = np.random.default_rng(100)
        p = codec.cfg.pad_multiple
        x = rng.uniform(0, 1, (1, p, p, 3)).astype(np.float32)
        y = codec.compress_latent(x)
        assert y.shape == (1, p // 16, p // 16, codec.cfg.M)
        out = codec.decompress_latent(y)
        x_hat = np.asarray(out["x_hat"])
        assert x_hat.shape == x.shape
        assert np.all(x_hat >= 0) and np.all(x_hat <= 1)

    def test_shipped_indexes_decode(self, codec):
        """DCAE_6-style decode with encoder-shipped indexes must equal the
        locally recomputed decode."""
        rng = np.random.default_rng(2)
        p = codec.cfg.pad_multiple
        x = rng.uniform(0, 1, (1, p, p, 3)).astype(np.float32)
        enc = codec.compress_with_indexes(x)
        local = codec.decompress(enc["strings"], enc["shape"])
        shipped = codec.decompress(enc["strings"], enc["shape"],
                                   indexes=enc["indexes"])
        np.testing.assert_allclose(np.asarray(local["x_hat"]),
                                   np.asarray(shipped["x_hat"]), atol=1e-6)

    def test_size_analysis(self, codec):
        rng = np.random.default_rng(0)
        p = codec.cfg.pad_multiple
        x = rng.uniform(0, 1, (1, p, p, 3)).astype(np.float32)
        report = codec.analyze_sizes(x)
        assert report["total_stream_bytes"] == (
            report["y_string_bytes"] + report["z_string_bytes"])
        assert report["model_params"] > 0
        assert report["raw_latent_bytes_bf16"] * 2 == \
            report["raw_latent_bytes_f32"]


class TestDriftHarness:
    def test_dump_and_compare_self(self, tmp_path):
        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.models import DCAECodec
        from dcae_tpu.utils import debug

        codec = DCAECodec(DCAEConfig.tiny(), seed=0)
        codec.update(force=True)
        rng = np.random.default_rng(1)
        p = codec.cfg.pad_multiple
        x = rng.uniform(0, 1, (1, p, p, 3)).astype(np.float32)
        debug.dump_codec_run(codec, x, str(tmp_path), "run_a")
        debug.dump_codec_run(codec, x, str(tmp_path), "run_b")
        report = debug.compare_dumps(str(tmp_path), "run_a", "run_b")
        assert report, "dump should contain tensors"
        assert all(e.get("equal") for e in report.values()), report


class TestCrossDeviceCodec:
    """tools/eval.py CrossDeviceCodec: separate encoder/decoder codecs
    (ref eval_1.py device placement) with optional DCAE_6 index shipping."""

    def test_proxy_round_trip(self):
        import sys as _sys
        import os as _os
        _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "tools"))
        from eval import CrossDeviceCodec

        from dcae_tpu.config import DCAEConfig
        from dcae_tpu.models.codec import DCAECodec

        cfg = DCAEConfig.tiny()
        enc = DCAECodec(cfg, seed=0)
        dec = DCAECodec(cfg, params=enc.params)
        rng = np.random.default_rng(5)
        x = rng.uniform(0, 1, (1, cfg.pad_multiple, cfg.pad_multiple, 3)
                        ).astype(np.float32)
        for ship in (False, True):
            cd = CrossDeviceCodec(enc, dec, ship_indexes=ship)
            cd.update(force=True)
            out = cd.compress(x)
            rec = cd.decompress(out["strings"], out["shape"])
            fwd = np.clip(np.asarray(cd.forward(x)["x_hat"]), 0, 1)
            np.testing.assert_allclose(np.asarray(rec["x_hat"]), fwd,
                                       atol=1e-5, err_msg=f"ship={ship}")
