"""Device meshes and sharded training (L6, TPU-native).

Replaces the reference's four distributed stacks (NCCL DDP, TensorPipe RPC,
manual CPU<->GPU copies, raw TCP; SURVEY.md §2.5) with ONE mechanism:
a jax.sharding.Mesh + jit. Axes:

  dp — data parallel over the batch (replaces DDP/NCCL all-reduce;
       XLA inserts the gradient psum over ICI)
  sp — spatial parallel over image rows (replaces nothing in the reference —
       it had no way to split one image; XLA's SPMD partitioner inserts conv
       halo exchanges automatically)

Parameters are replicated; only activations are sharded. The codec model is
~120M params — well within a single chip's HBM — so DP(+SP) is the sweet
spot; the mesh machinery below nevertheless generalizes to more axes.

Scope decision (round 5): the sp axis covers the TRANSFORM/TRAINING path
(forward, likelihood eval, train steps — where the FLOPs and the HBM
traffic are). Entropy CODING stays dp-only: a rANS stream is a sequential
state chain, and the channel-AR sigma->index chain must be reproduced
bit-exactly by the decoder — both are single-device-program properties.
Sharding one stream spatially would require a per-shard stream format and
bit-stable cross-shard context nets for no transform-side win at image
sizes. Under a dp x sp serving mesh the real codec therefore runs as a
per-device pool (DCAECodec(device=...) round robin over mesh.devices)
with byte-identical streams on every member — proven by
tests/test_serving_multichip.py::test_real_codec_on_dp_sp_mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, sp: int = 1,
              devices=None) -> Mesh:
    """A (dp, sp) mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % sp == 0, (n_devices, sp)
    dp = n_devices // sp
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """NHWC batch: B over dp, H over sp (when the mesh has sp>1)."""
    if spatial and mesh.shape["sp"] > 1:
        return NamedSharding(mesh, P("dp", "sp", None, None))
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(train_step, mesh: Mesh, spatial: bool = True):
    """jit the train step over the mesh: state replicated, batch sharded.
    XLA emits the dp gradient all-reduce and any sp halo exchanges."""
    return jax.jit(
        train_step,
        in_shardings=(replicated(mesh), batch_sharding(mesh, spatial)),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )


def shard_eval_step(eval_step, mesh: Mesh, spatial: bool = True):
    return jax.jit(
        eval_step,
        in_shardings=(replicated(mesh), batch_sharding(mesh, spatial)),
        out_shardings=replicated(mesh),
    )
