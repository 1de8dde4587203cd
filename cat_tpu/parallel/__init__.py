"""SPMD parallelism: mesh construction, sharding rules, ZeRO-1 layout.

Replaces the reference's torch.distributed DDP/NCCL stack
(/root/reference/cat/shared/coreutils.py:214-242 rendezvous,
cat/ctc/train.py:45-56 per-GPU process spawn, scheduler.py:50-87
ZeroRedundancyOptimizer): here a single program is jitted over a
jax.sharding.Mesh; gradient reduction, sync-BN statistics and eval-metric
all_reduce become XLA collectives inserted by GSPMD.
"""

from cat_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    tensor_parallel_shardings,
    zero1_shardings,
    shard_batch,
)
