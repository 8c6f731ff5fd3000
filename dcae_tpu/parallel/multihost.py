"""Multi-host initialization (replaces the reference's RPC master/worker
bootstrap, /root/reference/rpc/master.py:194-207, worker.py:20-56).

One call per process wires all hosts' chips into a single global mesh;
thereafter the data-parallel training in dcae_tpu.parallel.mesh works
unchanged — XLA routes the gradient all-reduce over ICI within a slice and
DCN across slices. No NIC pinning, device maps, or world-size bookkeeping.

Usage (per host):
    from dcae_tpu.parallel import multihost
    multihost.initialize(coordinator="10.0.0.1:9876",
                         num_processes=2, process_id=<rank>)
    mesh = make_mesh()             # spans every chip of every host
    batch = multihost.local_batch_to_global(local_np_batch, mesh)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). On TPU pods with
    standard metadata all three may be None."""
    kwargs = {}
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """Rank-0 guard for checkpointing/logging (the reference's rank-0-only
    checkpoint rule, train.py:283-291)."""
    return jax.process_index() == 0


def local_batch_to_global(local_batch: np.ndarray, mesh) -> jax.Array:
    """Assemble a global sharded batch from per-host shards: each host
    contributes its local images; the global array spans
    num_processes * local_B along the batch axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp"))
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch), global_shape)
