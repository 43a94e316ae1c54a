"""Analytic MXU-FLOP counter: dot/conv MACs from a traced jaxpr.

VERDICT r3 weak-#7: the bench MFU denominator was XLA's
``cost_analysis()['flops']``, which includes elementwise ops and silently
shifts if XLA changes fusion accounting. This module counts ONLY the
matmul/convolution multiply-accumulates (2*MACs) directly from the
jaxpr's static shapes — the "useful FLOPs" a roofline compares against
MXU peak — so the number is identical across XLA versions, backends and
rounds.

Counted primitives: ``dot_general``, ``conv_general_dilated`` (grouped
convs divide by ``feature_group_count`` via the kernel's per-group
in-channel dim). Control flow: ``scan`` bodies multiply by trip count;
``while`` bodies are counted once (lower bound); both ``cond`` branches
are averaged. ``pallas_call`` bodies are NOT traversed (our fused
kernels are opt-in and carry their own FLOP notes in docs/KERNELS.md) —
callers that enable fused kernels should treat the result as a lower
bound.
"""

from __future__ import annotations

import math


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_general_flops(eqn) -> float:
    (lhs_c, _rhs_c), (lhs_b, _rhs_b) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    k = _prod(lhs[i] for i in lhs_c)
    out = eqn.outvars[0].aval.shape
    # out shape = batch dims + lhs free + rhs free, so 2*K*prod(out)
    return 2.0 * k * _prod(out)


def _conv_flops(eqn) -> float:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    rhs_spec = dn.rhs_spec  # (out_ch, in_ch_per_group, *spatial)
    in_ch_per_group = rhs[rhs_spec[1]]
    kernel_spatial = _prod(
        rhs[i] for i in range(len(rhs)) if i not in rhs_spec[:2]
    )
    out_elems = _prod(eqn.outvars[0].aval.shape)
    return 2.0 * out_elems * kernel_spatial * in_ch_per_group


def _sub_jaxprs(eqn):
    """Yield (jaxpr, multiplier) pairs nested in an eqn's params."""
    params = eqn.params
    # trip-count multiplication applies ONLY to scan's body jaxpr; other
    # primitives may carry a 'length' param with different semantics
    length = params.get("length") if eqn.primitive.name == "scan" else None
    for key, val in params.items():
        vals = val if isinstance(val, (list, tuple)) else (val,)
        for v in vals:
            if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                v = v.jaxpr  # ClosedJaxpr
            elif not hasattr(v, "eqns"):
                continue
            if key == "branches":
                # cond: average the branches (they're alternatives)
                yield v, 1.0 / max(len(vals), 1)
            elif length is not None and key == "jaxpr":
                yield v, float(length)
            else:
                yield v, 1.0


def count_jaxpr(jaxpr, mult: float = 1.0) -> float:
    flops = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            flops += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            flops += _conv_flops(eqn)
        elif name == "pallas_call":
            continue  # opt-in fused kernels: counted in docs, not here
        else:
            for sub, m in _sub_jaxprs(eqn):
                flops += count_jaxpr(sub, m)
    return flops * mult


def matmul_conv_flops(fn, *args, **kwargs) -> float:
    """Analytic dot+conv FLOPs of one call of ``fn(*args, **kwargs)``.

    Traces with ``jax.make_jaxpr`` (abstract — nothing executes) and sums
    2*MACs over every dot_general / conv_general_dilated at their static
    shapes, recursing through pjit/scan/cond/custom-vjp sub-jaxprs.
    """
    import jax

    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    out = count_jaxpr(closed.jaxpr)
    if not math.isfinite(out):
        return 0.0
    return out
