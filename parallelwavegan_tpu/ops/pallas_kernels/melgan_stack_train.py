"""Training-capable fused MelGAN residual-stack chain: custom_vjp kernels.

Forward: the packed decode kernel (ops/pallas_kernels/melgan_stack.py
``fused_melgan_stacks_interior``) — per upsample stage, all ``stacks``
sequential ResidualStacks (reference layers/residual_stack.py via
models/melgan.py:99-141) plus, on the last stage, the generator's
trailing ``act -> out conv -> tanh``, every conv a dense
(rows, 128) @ (128, 128) MXU matmul with p = 128/C samples
space-to-depth packed into the lanes.

Backward: one fused reverse kernel that, per (batch, tile) grid step,
RECOMPUTES the stage forward inside a halo'd tile (the decode kernel's
exact op order, so recomputed activations match bit-for-bit) and walks
the chain in reverse emitting dx and every weight gradient in the same
call — the ``wavenet_stack_train.py`` recipe. Weight grads accumulate as
packed block-matrix partial sums (owned-row masked, so the sequential
TPU grid's revisited output blocks receive disjoint contributions) and
are mapped back to (K, Cin, Cout) tap layout by the adjoint of the
shift-table packing (``_unpack_wgrad``).

Reflect padding: like the decode wrapper, the fused custom_vjp core has
zero-pad ('same') semantics; the public wrapper recomputes the first and
last R outputs (R = receptive radius) with the differentiable XLA twin
on 3R-sample edge windows and concatenates. Because the stitched output
only uses core rows [R, T-R) — whose receptive cones never reach the
padding — upstream cotangents into the core's edge rows are zero and the
composite gradient is exact; edge cotangents flow through the XLA
windows' autodiff (including true reflect semantics) and JAX sums both
paths' weight grads.

Halo: the forward one-way margin is max(hl, hr) packed rows
(``prepare_packed``); the reverse conv-transposes spill the same margin
again, so the reverse kernel uses twice the decode halo (the
empirically-validated rule from wavenet_stack_train.py:195-202).

Behavioral reference for the stage math:
/root/reference/parallel_wavegan/layers/residual_stack.py:13-85 and
/root/reference/parallel_wavegan/models/melgan.py:99-141.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallelwavegan_tpu.ops.pallas_kernels.hifigan_mrf import (
    _conv_shift_table,
    _leaky,
    _round_up,
)
from parallelwavegan_tpu.ops.pallas_kernels.melgan_stack import (
    LANES,
    _pow2_at_least,
    _receptive_radius,
    fused_melgan_stacks_interior,
    melgan_stacks_xla,
    prepare_packed,
    substitute_biases,
)
from parallelwavegan_tpu.ops.pallas_kernels.tade_train import (
    _apply_conv_t,
    _conv_wgrads,
)

_STACK_KEYS = ("wd", "bd", "w1", "b1", "ws", "bs")


def _dleaky(x, slope: float):
    # compare in f32: Mosaic 500s on bf16-compare selects (round-5 bisect)
    return jnp.where(x.astype(jnp.float32) >= 0,
                     jnp.float32(1.0), jnp.float32(slope))


def _unpack_wgrad(dmats, dbias, k: int, d: int, p: int, c0p: int,
                  cin: int, cout: int):
    """Adjoint of ``prepare_packed``'s block packing: packed grads -> taps."""
    table = _conv_shift_table(k, d, p)
    dw = jnp.zeros((k, c0p, c0p), jnp.float32)
    for si, s in enumerate(sorted(table)):
        for j_in, j_out, kk in table[s]:
            blk = lax.slice(
                dmats[si],
                (j_in * c0p, j_out * c0p),
                (j_in * c0p + c0p, j_out * c0p + c0p),
            )
            dw = dw.at[kk].add(blk)
    db = jnp.zeros((c0p,), jnp.float32)
    for j in range(p):
        db = db + lax.slice(dbias[0], (j * c0p,), (j * c0p + c0p,))
    return dw[:, :cin, :cout], db[:cout]


# ---------------------------------------------------------------------------
# reverse kernel
# ---------------------------------------------------------------------------


def _kernel_stacks_bwd(
    x_hbm, dy_hbm, *refs, t_tile: int, halo: int, p: int, c0p: int,
    stack_shifts: tuple, final_shifts, slope: float, seq_len: int,
    n_weights: int, mxu_bf16: bool = False,
):
    w_refs = refs[:n_weights]
    dx_out = refs[n_weights]
    g_refs = refs[n_weights + 1: 2 * n_weights + 1]
    x_scr, dy_scr, s0, s1 = refs[2 * n_weights + 1:]

    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * pl.num_programs(1) + i

    @pl.when(step == 0)
    def _():
        for ref in g_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    rows = t_tile + 2 * halo
    for hbm, scr, sem in ((x_hbm, x_scr, s0), (dy_hbm, dy_scr, s1)):
        dma = pltpu.make_async_copy(
            hbm.at[b, pl.ds(i * t_tile, rows), :], scr, sem)
        dma.start()
        dma.wait()

    pos0 = i * t_tile - halo

    def mask_rows(val, off, length):
        row = lax.broadcasted_iota(jnp.int32, (length, LANES), 0)
        lane = lax.broadcasted_iota(jnp.int32, (length, LANES), 1)
        samp = (pos0 + off + row) * p + lane // c0p
        ok = (samp >= 0) & (samp < seq_len)
        return jnp.where(ok, val, jnp.zeros_like(val))

    def owned(val, off, length):
        """Zero all but this tile's owned in-sequence rows."""
        row = lax.broadcasted_iota(jnp.int32, (length, LANES), 0)
        lane = lax.broadcasted_iota(jnp.int32, (length, LANES), 1)
        gr = pos0 + off + row
        samp = gr * p + lane // c0p
        ok = (
            (gr >= i * t_tile) & (gr < (i + 1) * t_tile)
            & (samp >= 0) & (samp < seq_len)
        )
        return jnp.where(ok, val, jnp.zeros_like(val))

    def apply_conv(src, off, length, shifts, wmat_ref, bias_ref):
        s_min, s_max = shifts[0], shifts[-1]
        new_len = length - (s_max - s_min)
        z = None
        for si, s in enumerate(shifts):
            lhs = lax.slice_in_dim(src, s - s_min, s - s_min + new_len,
                                   axis=0)
            rhs = wmat_ref[si]
            if mxu_bf16:
                lhs = lhs.astype(jnp.bfloat16)
                rhs = rhs.astype(jnp.bfloat16)
            contrib = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
            z = contrib if z is None else z + contrib
        return z + bias_ref[:][None, :], off - s_min, new_len

    apply_conv_t = functools.partial(_apply_conv_t, mxu_bf16=mxu_bf16)
    conv_wgrads = functools.partial(_conv_wgrads, mxu_bf16=mxu_bf16)

    # ---- forward recompute (decode _kernel_stacks' exact op order) -------
    wi = 0

    def next_ref():
        nonlocal wi
        r = w_refs[wi]
        wi += 1
        return r

    stack_refs = []
    saved = []
    xv = x_scr[:]
    off, length = 0, rows
    for sd, s1s in stack_shifts:
        wd, bd, w1, b1, ws, bs = (next_ref() for _ in range(6))
        stack_refs.append((wd, w1, ws))
        t_in = mask_rows(_leaky(xv, slope), off, length)
        z, o1, l1 = apply_conv(t_in, off, length, sd, wd, bd)
        z2, o2, l2 = apply_conv(_leaky(z, slope), o1, l1, s1s, w1, b1)
        skip, _, _ = apply_conv(
            lax.slice_in_dim(xv, o2 - off, o2 - off + l2, axis=0),
            o2, l2, (0,), ws, bs)
        saved.append((xv, off, length, z, o1, l1))
        xv, off, length = z2 + skip, o2, l2
    if final_shifts is not None:
        wf, bf = next_ref(), next_ref()
        t_f = mask_rows(_leaky(xv, slope), off, length)
        yf, of, lf = apply_conv(t_f, off, length, final_shifts, wf, bf)
        yf = jnp.tanh(yf)

    # ---- reverse ---------------------------------------------------------
    gi = len(g_refs)

    def prev_grefs(n):
        nonlocal gi
        gi -= n
        return g_refs[gi:gi + n]

    if final_shifts is not None:
        dwf, dbf = prev_grefs(2)
        dyv = lax.slice_in_dim(dy_scr[:], of, of + lf, axis=0)
        dzf = dyv * (1.0 - yf * yf)
        conv_wgrads(t_f, owned(dzf, of, lf), lf, final_shifts, dwf, dbf)
        dt = apply_conv_t(dzf, lf, length, final_shifts, wf)
        dxv = mask_rows(dt, off, length) * _dleaky(xv, slope)
    else:
        dxv = lax.slice_in_dim(dy_scr[:], off, off + length, axis=0)

    for si_ in range(len(stack_shifts) - 1, -1, -1):
        sd, s1s = stack_shifts[si_]
        wd, w1, ws = stack_refs[si_]
        dwd, dbd, dw1, db1, dws, dbs = prev_grefs(6)
        xv_l, off_l, len_l, z, o1, l1 = saved[si_]
        # dxv at the stack's output frame (o1, l1)
        dz2_own = owned(dxv, o1, l1)
        a = _leaky(z, slope)
        conv_wgrads(a, dz2_own, l1, s1s, dw1, db1)
        x_slice = lax.slice_in_dim(xv_l, o1 - off_l, o1 - off_l + l1, axis=0)
        conv_wgrads(x_slice, dz2_own, l1, (0,), dws, dbs)
        da = apply_conv_t(dxv, l1, l1, s1s, w1)
        dz = da * _dleaky(z, slope)
        t_in = mask_rows(_leaky(xv_l, slope), off_l, len_l)
        conv_wgrads(t_in, owned(dz, o1, l1), l1, sd, dwd, dbd)
        dt = apply_conv_t(dz, l1, len_l, sd, wd)
        dx_skip = apply_conv_t(dxv, l1, l1, (0,), ws)
        dx_skip = jnp.pad(
            dx_skip, ((o1 - off_l, len_l - (o1 - off_l) - l1), (0, 0)))
        dxv = mask_rows(dt, off_l, len_l) * _dleaky(xv_l, slope) + dx_skip
        off, length = off_l, len_l

    dx_out[0] = lax.slice_in_dim(
        dxv, halo, halo + t_tile, axis=0).astype(dx_out.dtype)


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def _run_stacks_bwd(x, dy, stacks, final, slope, t_tile, interpret):
    b, t, c0 = x.shape
    c0p = max(32, _pow2_at_least(c0))
    p = LANES // c0p
    flat_w, stack_shifts, final_shifts, hl, hr = prepare_packed(
        stacks, final, p, c0p)
    # bf16-resident: bf16 activations/cotangents in HBM + VMEM scratch,
    # f32 weight-grad accumulators (KERNELS.md round-5 section)
    io_dtype = (jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
    granule = 16 if io_dtype == jnp.bfloat16 else 8
    halo = _round_up(2 * max(hl, hr, 1), granule)

    tile = min(t_tile, _round_up(-(-t // p), granule))
    n_tiles = -(-t // (p * tile))
    rows_total = n_tiles * tile

    def prep(v):
        ch = v.shape[-1]
        vp = jnp.pad(
            v.astype(io_dtype),
            ((0, 0), (0, rows_total * p - v.shape[1]), (0, c0p - ch)),
        ).reshape(b, rows_total, LANES)
        return jnp.pad(vp, ((0, 0), (halo, halo), (0, 0)))

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 2
    g_specs, g_shapes = [], []
    for w in flat_w:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda bb, ii, nd=w.ndim: (0,) * nd),
            memory_space=pltpu.VMEM,
        ))
        gshape = w.shape if w.ndim == 3 else (1, LANES)
        g_specs.append(pl.BlockSpec(
            gshape, (lambda bb, ii, nd=len(gshape): (0,) * nd),
            memory_space=pltpu.VMEM,
        ))
        g_shapes.append(jax.ShapeDtypeStruct(gshape, jnp.float32))

    kernel = functools.partial(
        _kernel_stacks_bwd, t_tile=tile, halo=halo, p=p, c0p=c0p,
        stack_shifts=tuple(stack_shifts), final_shifts=final_shifts,
        slope=slope, seq_len=t, n_weights=len(flat_w),
        mxu_bf16=io_dtype == jnp.bfloat16,
    )
    rows = tile + 2 * halo
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(
            (1, tile, LANES), lambda bb, ii: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        )] + g_specs,
        out_shape=[jax.ShapeDtypeStruct(
            (b, rows_total, LANES), io_dtype)] + g_shapes,
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(prep(x), prep(dy), *flat_w)

    dx = outs[0].reshape(b, rows_total * p, c0p)[:, :t, :c0]
    grads = outs[1:]
    dstacks = []
    gi = 0
    for st in stacks:
        k, d = st["wd"].shape[0], int(st["dilation"])
        dwd, dbd = _unpack_wgrad(grads[gi], grads[gi + 1], k, d, p, c0p,
                                 c0, c0)
        dw1, db1 = _unpack_wgrad(grads[gi + 2], grads[gi + 3], 1, 1, p, c0p,
                                 c0, c0)
        dws, dbs = _unpack_wgrad(grads[gi + 4], grads[gi + 5], 1, 1, p, c0p,
                                 c0, c0)
        gi += 6
        dstacks.append({"wd": dwd, "bd": dbd, "w1": dw1, "b1": db1,
                        "ws": dws, "bs": dbs})
    dfinal = None
    if final is not None:
        kf, out_ch = final[0].shape[0], final[0].shape[-1]
        dfinal = _unpack_wgrad(grads[gi], grads[gi + 1], kf, 1, p, c0p,
                               c0, out_ch)
    return dx, tuple(dstacks), dfinal


# ---------------------------------------------------------------------------
# custom_vjp core + public wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _stacks_core(x, ws, dilations, slope, t_tile, interpret):
    """Differentiable fused interior; ws = {"stacks": (dicts...),
    "final": (w, b) | None}."""
    return _core_fwd_impl(x, ws, dilations, slope, t_tile, interpret)[0]


def _core_fwd_impl(x, ws, dilations, slope, t_tile, interpret):
    stacks = [dict(st, dilation=d) for st, d in zip(ws["stacks"], dilations)]
    y = fused_melgan_stacks_interior(
        x, stacks, final=ws["final"], slope=slope, t_tile=t_tile,
        interpret=interpret)
    return y, (x, ws)


def _core_bwd(dilations, slope, t_tile, interpret, res, dy):
    x, ws = res
    interpret = interpret or jax.default_backend() != "tpu"
    stacks = [dict(st, dilation=d) for st, d in zip(ws["stacks"], dilations)]
    dx, dstacks, dfinal = _run_stacks_bwd(
        x, dy, stacks, ws["final"], slope, t_tile, interpret)
    dx = dx.astype(x.dtype)
    dws = {
        "stacks": tuple(
            {k: dst[k].astype(st[k].dtype) for k in _STACK_KEYS}
            for dst, st in zip(dstacks, ws["stacks"])
        ),
        "final": None if dfinal is None else (
            dfinal[0].astype(ws["final"][0].dtype),
            dfinal[1].astype(ws["final"][1].dtype),
        ),
    }
    return dx, dws


_stacks_core.defvjp(_core_fwd_impl, _core_bwd)


def fused_melgan_stacks_train(
    x, stacks, *, final=None, slope: float = 0.2,
    pad_mode: str = "reflect", t_tile: int = 512, interpret: bool = False,
):
    """Differentiable fused ResidualStack chain (one MelGAN upsample
    stage). Same interface and forward values as
    ``melgan_stack.fused_melgan_stacks``; gradients run through the fused
    reverse kernel for the interior and XLA autodiff for the 3R edge
    windows."""
    interpret = interpret or jax.default_backend() != "tpu"
    t, c0 = x.shape[1], x.shape[-1]
    stacks, final = substitute_biases(stacks, final, c0)
    r = _receptive_radius(stacks, final)
    if r == 0 or t <= 2 * r:
        return melgan_stacks_xla(x, stacks, final=final, slope=slope,
                                 pad_mode=pad_mode)
    ws = {
        "stacks": tuple(
            {k: st[k] for k in _STACK_KEYS} for st in stacks),
        "final": final,
    }
    dil = tuple(int(st["dilation"]) for st in stacks)
    y = _stacks_core(x, ws, dil, slope, t_tile, bool(interpret))
    w = min(3 * r, t)
    yl = melgan_stacks_xla(x[:, :w], stacks, final=final, slope=slope,
                           pad_mode=pad_mode)[:, :r]
    yr = melgan_stacks_xla(x[:, -w:], stacks, final=final, slope=slope,
                           pad_mode=pad_mode)[:, -r:]
    return jnp.concatenate([yl, y[:, r:t - r], yr], axis=1)
