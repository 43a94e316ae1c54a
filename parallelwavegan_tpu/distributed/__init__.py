"""Distributed launch surface (parity shim).

The reference ships an env-var subprocess launcher pairing with NCCL
process groups (/root/reference/parallel_wavegan/distributed/launch.py).
On TPU there is nothing to launch: the runtime starts one process per host
and `jax.distributed.initialize()` + the sharded train step cover the rest.
``python -m parallelwavegan_tpu.distributed.launch`` exists for script
compatibility and for spawning multi-process *CPU* simulations.
"""
