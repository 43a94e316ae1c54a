"""Device-mesh data parallelism (replaces NCCL/apex DDP + launcher).

The reference's distributed stack — env-var process launcher
(/root/reference/parallel_wavegan/distributed/launch.py:117-171), NCCL
process groups (bin/train.py:1050-1057), apex DDP (:1494-1503) and
DistributedSampler (:1326-1341) — collapses into jax.sharding: a 1-D
``data`` mesh, replicated params, batch sharded along ``data``, and XLA
inserting the gradient all-reduce over ICI inside the one jitted step.
"""

from parallelwavegan_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
    shard_state,
)
