"""Multi-process launch shim (`python -m parallelwavegan_tpu.distributed.launch`).

Behavioral reference: /root/reference/parallel_wavegan/distributed/launch.py
:117-171 (spawn nproc_per_node x nnodes processes with MASTER_ADDR /
WORLD_SIZE / RANK env and wait).

TPU reality: the TPU runtime already starts one process per host and JAX's
single-controller model replaces rank logic, so on TPU this wrapper simply
execs the command. With ``--backend cpu`` it spawns N processes wired up
via ``jax.distributed`` env vars — useful for exercising the multi-host
code path without a pod.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def _repo_root_pythonpath() -> str:
    """PYTHONPATH that makes ``parallelwavegan_tpu`` importable in children.

    Training scripts are launched by *file path* (torch.distributed.launch
    interface), so the child's sys.path[0] is the script's directory — not
    the repo root this launcher was imported from. Prepend our own package
    root so the child resolves the same installation."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    existing = os.environ.get("PYTHONPATH")
    return root + (os.pathsep + existing if existing else "")


def main():
    parser = argparse.ArgumentParser(description="Distributed launch shim.")
    parser.add_argument("--nproc_per_node", type=int, default=1)
    parser.add_argument("--nnodes", type=int, default=1)
    parser.add_argument("--node_rank", type=int, default=0)
    parser.add_argument("--master_addr", default="127.0.0.1", type=str)
    parser.add_argument("--master_port", default=29500, type=int)
    parser.add_argument("--backend", default="tpu", choices=["tpu", "cpu"])
    parser.add_argument(
        "-c", "--use_env_cmd", default=False, action="store_true",
        help="command is a console script rather than a python module",
    )
    parser.add_argument("training_script", type=str)
    parser.add_argument("training_script_args", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.backend == "tpu":
        # nothing to spawn: the TPU runtime provides process bootstrap and
        # jax.distributed discovers peers itself
        if args.use_env_cmd:
            cmd = [args.training_script] + args.training_script_args
        else:
            cmd = [sys.executable, args.training_script] + args.training_script_args
            os.environ["PYTHONPATH"] = _repo_root_pythonpath()
        os.execvp(cmd[0], cmd)

    world = args.nproc_per_node * args.nnodes
    procs = []
    for local_rank in range(args.nproc_per_node):
        rank = args.node_rank * args.nproc_per_node + local_rank
        env = dict(os.environ)
        # TPU plugins that register via sitecustomize can override
        # JAX_PLATFORMS; drop their trigger so --backend cpu really
        # forces CPU in the children
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"{args.master_addr}:{args.master_port}",
            JAX_NUM_PROCESSES=str(world),
            JAX_PROCESS_ID=str(rank),
        )
        if not args.use_env_cmd:
            env["PYTHONPATH"] = _repo_root_pythonpath()
        if args.use_env_cmd:
            cmd = [args.training_script] + args.training_script_args
        else:
            cmd = [sys.executable, args.training_script] + args.training_script_args
        procs.append(subprocess.Popen(cmd, env=env))

    # poll all children: a rank that dies before the jax.distributed
    # rendezvous leaves its peers blocked in collectives forever, so the
    # first nonzero exit terminates the rest and fails fast (the
    # reference launcher has the same hang, launch.py:168-171 — waiting
    # sequentially is not a behavior worth keeping)
    import time

    first_bad = None
    try:
        while procs:
            for p in list(procs):
                rc = p.poll()
                if rc is None:
                    continue
                procs.remove(p)
                if rc != 0 and first_bad is None:
                    first_bad = rc
            if first_bad is not None:
                break
            time.sleep(0.2)
    finally:
        if first_bad is not None:
            for p in procs:
                p.terminate()
            for p in procs:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.kill()
    if first_bad is not None:
        raise subprocess.CalledProcessError(first_bad, "distributed launch")


if __name__ == "__main__":
    main()
