"""Subprocess entry for the 2-process jax.distributed smoke test
(tests/test_multihost.py). Each process contributes 2 virtual CPU devices
to a 4-device global dp mesh and runs one sharded RD train step.

Replaces the reference's master/worker RPC bootstrap as the multi-machine
story (ref rpc/master.py:194-207, rpc/worker.py:20-56).
"""

import os
import sys


def main():
    coordinator, n_proc, rank = sys.argv[1], int(sys.argv[2]), int(
        sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()

    import jax

    # the hosted TPU plugin overrides JAX_PLATFORMS; force the config path
    # (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    cache = os.path.join(repo, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dcae_tpu.parallel import multihost
    from dcae_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        replicated, shard_train_step)

    multihost.initialize(coordinator=coordinator, num_processes=n_proc,
                         process_id=rank)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 2 * n_proc, len(jax.devices())
    assert multihost.is_primary() == (rank == 0)

    from dcae_tpu.config import DCAEConfig
    from dcae_tpu.models.dcae import DCAE
    from dcae_tpu.train.state import create_train_state, make_optimizer
    from dcae_tpu.train.step import make_train_step

    cfg = DCAEConfig.tiny()
    model = DCAE(cfg)
    p = cfg.pad_multiple
    local_batch = np.random.RandomState(rank).uniform(
        0, 1, (2, p, p, 3)).astype(np.float32)

    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, p, p, 3), jnp.float32),
                        training=False)["params"]
    tx = make_optimizer(1e-4, 1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))

    mesh = make_mesh(sp=1)  # all 4 global devices, dp=4
    state = jax.device_put(state, replicated(mesh))
    gbatch = multihost.local_batch_to_global(local_batch, mesh)
    assert gbatch.shape[0] == 2 * n_proc, gbatch.shape

    step = shard_train_step(make_train_step(model, tx, lmbda=0.013), mesh)
    new_state, metrics = step(state, gbatch)
    jax.block_until_ready(new_state.params)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"RANK{rank} OK loss={loss:.4f} step={int(new_state.step)}",
          flush=True)


if __name__ == "__main__":
    main()
