"""CLI coverage for the round-4 eval additions (VERDICT r3 item 7):

- tools/eval_autoencoder.py joint mode (ref eval_g_a_g_s.py)
- tools/eval_autoencoder.py --split: fp16 latent shipping, per-stage
  encode/transfer/decode timing, size analysis
  (ref eval_g_a_g_s_split.py:456-500,596-625)
- tools/compress_and_decompress.py --latent: DLT1 latent-handoff
  containers incl. the int8 cast experiment (ref eval_3.py:103,
  check.py:668-679)
"""

import os

import numpy as np
import pytest

from dcae_tpu.runtime import container


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    for i, (h, w) in enumerate([(192, 256), (176, 240)]):
        base = rng.uniform(0, 1, (h // 16, w // 16, 3))
        img = np.clip(np.kron(base, np.ones((16, 16, 1)))
                      + rng.normal(0, 0.02, (h, w, 3)), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            str(d / f"im{i}.png"))
    return str(d)


def test_latent_container_roundtrip_dtypes():
    rng = np.random.default_rng(0)
    y = rng.normal(0, 3, (1, 4, 6, 20)).astype(np.float32)
    for dtype, atol in [("float32", 0), ("float16", 2e-3),
                        ("bfloat16", 3e-2), ("int8", 0.06)]:
        blob = container.pack_latent(y, (100, 150), dtype=dtype)
        got, padding, (h, w) = container.unpack_latent(blob)
        assert (h, w) == (100, 150)
        assert container.is_latent_bin(blob)
        assert not container.is_interleaved_bin(blob)
        np.testing.assert_allclose(got, y, atol=max(atol * 3, 1e-7),
                                   rtol=atol)
    # int8 payload really is 1 byte/value
    blob8 = container.pack_latent(y, (100, 150), dtype="int8")
    blob32 = container.pack_latent(y, (100, 150), dtype="float32")
    assert len(blob32) - len(blob8) == y.size * 3


def test_eval_autoencoder_cli_joint(image_dir, tmp_path):
    from tools.eval_autoencoder import main

    out = str(tmp_path / "out")
    main(["--data", image_dir, "--tiny", "--M", "20",
          "--save_path", out])
    assert os.path.exists(os.path.join(out, "summary_results.txt"))
    assert os.path.exists(os.path.join(out, "reconstructed_im0.png"))
    assert os.path.exists(os.path.join(out, "metrics_im0.txt"))
    with open(os.path.join(out, "summary_results.txt")) as f:
        text = f.read()
    assert "Average PSNR" in text and "Compression Ratio" in text


def test_eval_autoencoder_cli_split(image_dir, tmp_path, capsys):
    from tools.eval_autoencoder import main

    out = str(tmp_path / "out")
    main(["--data", image_dir, "--tiny", "--M", "20", "--split",
          "--latent_dtype", "float16", "--save_path", out])
    printed = capsys.readouterr().out
    # per-stage timing + one-time size analysis (ref :456-500)
    assert "xfer" in printed
    assert "SIZE ANALYSIS" in printed
    assert "spatial_reduction" in printed
    with open(os.path.join(out, "summary_results_split.txt")) as f:
        text = f.read()
    assert "transfer time" in text
    assert "float16 latent" in text


@pytest.mark.parametrize("latent_dtype", ["float16", "int8"])
def test_compress_decompress_latent_mode(image_dir, tmp_path, latent_dtype):
    from tools.compress_and_decompress import main

    save = str(tmp_path / "o")
    main(["--mode", "compress", "--data", image_dir, "--save_path", save,
          "--tiny", "--latent", latent_dtype])
    bins = sorted(os.listdir(os.path.join(save, "bin")))
    assert bins == ["im0.bin", "im1.bin"]
    with open(os.path.join(save, "bin", "im0.bin"), "rb") as f:
        assert container.is_latent_bin(f.read(4))
    main(["--mode", "decompress", "--data", os.path.join(save, "bin"),
          "--save_path", save, "--tiny"])
    pngs = sorted(os.listdir(os.path.join(save, "png")))
    assert pngs == ["im0.png", "im1.png"]
    from PIL import Image

    im = np.asarray(Image.open(os.path.join(save, "png", "im0.png")))
    assert im.shape == (192, 256, 3)  # cropped back to source dims
