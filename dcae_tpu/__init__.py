"""dcae_tpu — TPU-native learned image compression framework.

A ground-up JAX/Flax/Pallas rebuild of DCAE ("Learned Image Compression with
Dictionary-based Entropy Model", CVPR 2025) and its distributed-codec fork
(reference: Pittmann-XIE/DCAE). The compute path is XLA-compiled NHWC
JAX; the entropy-coding runtime is in-repo C++ (dcae_tpu/native); training
scales over TPU meshes with jax.sharding instead of DDP/NCCL.

Layer map (cf. SURVEY.md §1):
  L0 entropy-coding runtime  -> dcae_tpu.entropy.rans (+ native/rans.cpp)
  L1 NN block library        -> dcae_tpu.ops
  L2 model layer             -> dcae_tpu.models
  L3 bitstream container/CLI -> dcae_tpu.runtime.container, tools/
  L4 training                -> dcae_tpu.train, tools/train.py
  L5 evaluation              -> dcae_tpu.eval_lib, tools/eval.py
  L6 distributed/serving     -> dcae_tpu.parallel, dcae_tpu.runtime.service
  L7 data tooling            -> dcae_tpu.data
  L8 diagnostics             -> dcae_tpu.utils
"""

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA executables across processes (big codec graphs take
    minutes to compile on small hosts). Opt out: DCAE_TPU_NO_CACHE=1."""
    if _os.environ.get("DCAE_TPU_NO_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  _os.pardir, ".jax_cache")
            jax.config.update("jax_compilation_cache_dir",
                              _os.path.abspath(cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


def _force_cpu_platform_if_requested() -> None:
    """JAX_PLATFORMS=cpu must also flip the config path: the hosted TPU
    PJRT plugin re-registers itself over the env var and its pool claim
    can block INDEFINITELY in a dead tunnel window (same guard as
    tests/conftest.py and bench.py — here so every tools/ CLI gets it)."""
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


_enable_compilation_cache()
_force_cpu_platform_if_requested()

from dcae_tpu.config import DCAEConfig  # noqa: E402

__version__ = "0.1.0"

__all__ = ["DCAEConfig", "__version__"]
