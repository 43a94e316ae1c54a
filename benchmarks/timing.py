"""Tunnel-safe device-chained timing for benchmark pieces.

Queued-dispatch timing (`for _ in range(N): f(x)` then one
block_until_ready) massively UNDER-reports on the tunneled axon runtime:
passthrough outputs resolve early and the host can run ahead of the
device, so a 100 ms program can "measure" 3 ms. The only trustworthy
pattern chains the iterations inside ONE jitted program with a data
dependence between steps and ends with a scalar fetch (see
bench.py / .claude/skills/verify).

``chained_time(fn, *args)`` compiles ``lax.fori_loop`` over ``fn`` where
each iteration perturbs the float leaves of one argument by
``carry * 1e-20`` (numerically a no-op, but XLA cannot hoist the body)
and the carry is the mean of the first float output leaf.
"""

from __future__ import annotations

import time


def chained_time(fn, *args, iters: int = 30, perturb_arg: int | None = None):
    """Seconds per call of ``fn(*args)``, device-chained.

    ``perturb_arg``: index of the argument whose float leaves receive the
    carry perturbation (default: the last argument containing inexact
    leaves — PRNG keys are integer-typed so they never match — usually
    the batch).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def _has_inexact(tree):
        return any(
            hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
            for x in jax.tree_util.tree_leaves(tree)
        )

    if perturb_arg is None:
        perturb_arg = next(
            (i for i in reversed(range(len(args))) if _has_inexact(args[i])),
            0,
        )
    if not _has_inexact(args[perturb_arg]):
        raise ValueError(
            f"chained_time: perturb_arg={perturb_arg} has no inexact leaves; "
            "the chain would not prevent XLA from hoisting the loop body"
        )

    def _perturb(tree, eps):
        return jax.tree_util.tree_map(
            lambda x: x + eps.astype(x.dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
            else x,
            tree,
        )

    def _scalar(out):
        # The carry must consume EVERY inexact output leaf: the loop's
        # only live value is this scalar, so any output not feeding it is
        # dead code — XLA then deletes that slice of the program from the
        # loop body. With a single-leaf carry, a train step's backward
        # pass and optimizer update were eliminated entirely and the
        # "measurement" timed only the forward slice (found round 5:
        # 6 ms for a 36 ms program). Summing a mean per leaf keeps the
        # whole program live at ~0.5 ms/iter of extra reductions for an
        # 85M-param state — noise against the >10 ms programs this
        # helper is for.
        leaves = [
            leaf for leaf in jax.tree_util.tree_leaves(out)
            if hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.inexact)
        ]
        if not leaves:
            return jnp.float32(0.0)
        acc = jnp.float32(0.0)
        for leaf in leaves:
            acc = acc + jnp.mean(leaf).astype(jnp.float32)
        return acc

    @jax.jit
    def run(salt, *a):
        def body(_, carry):
            a2 = list(a)
            a2[perturb_arg] = _perturb(
                a2[perturb_arg], (carry + salt) * 1e-20)
            return _scalar(fn(*a2))

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # The salt varies the timed call's inputs from the warm call's at
    # zero cost (same compiled program). NOTE the round-5 forensic
    # conclusion: the impossible >1000 TF/s readings this helper used to
    # produce were caused by the DCE hazard documented in ``_scalar``
    # above (a single-leaf carry let XLA delete most of the program),
    # NOT by any runtime caching of identical dispatches — but identical
    # repeat dispatches cost nothing to avoid, so the salt stays as
    # insurance.
    float(jax.device_get(run(jnp.float32(0.0), *args)))  # compile + warm
    start = time.perf_counter()
    float(jax.device_get(run(jnp.float32(1.0), *args)))
    return (time.perf_counter() - start) / iters
