"""Distributed layer (L6): mesh + sharded steps."""

from dcae_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated,
                                    shard_eval_step, shard_train_step)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_train_step",
           "shard_eval_step"]
