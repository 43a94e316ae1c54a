"""Fused MelGAN residual-stack decode kernel (space-to-depth packed).

A MelGAN upsample stage (reference models/melgan.py:99-141) follows each
transposed conv with ``stacks`` sequential ResidualStacks
(layers/residual_stack.py:13-85): per stack, ``act -> dilated k-tap conv
-> act -> 1x1 conv`` plus a 1x1 skip conv, at dilations ``k**j``. Run as
XLA ops at decode lengths these 3*stacks convolutions each re-read and
re-write the full small-channel activation from HBM — bandwidth-bound
exactly like the HiFi-GAN C<=64 MRF stages (hifigan_mrf.py). This module
fuses the whole per-stage chain (optionally + the generator's trailing
``act -> k7 out conv -> tanh``) into ONE Pallas kernel that keeps every
intermediate in VMEM; each stage's activation touches HBM once in and
once out.

Packing reuses hifigan_mrf.py's space-to-depth scheme: p = 128 // c0p
consecutive samples share the 128-lane dimension (c0p = pow2 >= C), so a
k-tap dilated conv is a static set of packed-row shifts, each a dense
``(rows, 128) @ (128, 128)`` MXU matmul. The transposed convs between
stages stay in XLA — they are matmul-shaped (MXU-efficient) and change
the packing ratio (MelGAN halves channels under stride 8, so the
``p * C = 128`` invariant of hifigan_tail.py does not carry across its
stages).

Reflection padding: MelGAN reflect-pads every conv, so the fused kernel
(zero-masked halos) is exact only in the interior. The wrapper recomputes
the first/last R output samples (R = the chain's receptive radius) with
the XLA twin on a 3R-sample edge window — reflect semantics at the outer
edge are those of the full sequence, and the window's inner edge lies
outside the output cone — and stitches them over the fused result.

Weights arrive FOLDED (weight norm applied) in lax.conv "TIO" (K, Cin,
Cout) layout, exactly what ``Conv1d(..., return_params=True)`` yields.
Inference-only; training stays on XLA (see train/step.py
``mixed_precision``).
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
    _pack_conv_weights,
    _round_up,
)

LANES = 128


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# XLA twin (edge windows / fallback / equivalence tests)
# ---------------------------------------------------------------------------


def _pad(x, r: int, mode: str):
    return jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode=mode)


def _conv(x, w, b, d: int = 1):
    # harmonize dtypes: under mixed precision activations may arrive
    # bf16 while caller-kept weights are f32 (conv requires equal dtypes)
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(0, 0)], rhs_dilation=(d,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return out if b is None else out + b.astype(x.dtype)


def melgan_stacks_xla(x, stacks, *, final=None, slope: float = 0.2,
                      pad_mode: str = "reflect"):
    """Sequential ResidualStacks on folded weights. x (B, T, C).

    stacks: [{"wd" (k,C,C), "bd", "w1" (1,C,C), "b1", "ws" (1,C,C), "bs",
    "dilation" d}]. final: optional (w (k,C,out), b) fusing the
    generator's trailing act -> out conv -> tanh.
    """
    for st in stacks:
        k, d = st["wd"].shape[0], int(st["dilation"])
        t = _pad(_leaky(x, slope), (k - 1) // 2 * d, pad_mode)
        z = _conv(t, st["wd"], st["bd"], d)
        z = _conv(_leaky(z, slope), st["w1"], st["b1"])
        x = z + _conv(x, st["ws"], st["bs"])
    if final is not None:
        fw, fb = final
        t = _pad(_leaky(x, slope), (fw.shape[0] - 1) // 2, pad_mode)
        x = jnp.tanh(_conv(t, fw, fb))
    return x


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel_stacks(
    x_hbm, *refs, t_tile: int, halo: int, p: int, c0p: int,
    stack_shifts: tuple, final_shifts, slope: float, seq_len: int,
    n_weights: int, mxu_bf16: bool = False,
):
    w_refs = refs[:n_weights]
    out = refs[n_weights]
    x_scr = refs[n_weights + 1]
    sem = refs[n_weights + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = t_tile + 2 * halo
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * t_tile, rows), :], x_scr, sem)
    dma.start()
    dma.wait()

    pos0 = i * t_tile - halo

    def mask_rows(val, off, length):
        row = lax.broadcasted_iota(jnp.int32, (length, LANES), 0)
        lane = lax.broadcasted_iota(jnp.int32, (length, LANES), 1)
        samp = (pos0 + off + row) * p + lane // c0p
        ok = (samp >= 0) & (samp < seq_len)
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

    wi = 0

    def next_ref():
        nonlocal wi
        r = w_refs[wi]
        wi += 1
        return r

    xv = x_scr[:]
    off, length = 0, rows
    for sd, s1 in stack_shifts:
        wd, bd, w1, b1, ws, bs = (next_ref() for _ in range(6))
        t = mask_rows(_leaky(xv, slope), off, length)
        z, o1, l1 = apply_conv(t, off, length, sd, wd, bd)
        z2, o2, l2 = apply_conv(_leaky(z, slope), o1, l1, s1, w1, b1)
        skip, _, _ = apply_conv(
            lax.slice_in_dim(xv, o2 - off, o2 - off + l2, axis=0),
            o2, l2, (0,), ws, bs)
        xv, off, length = z2 + skip, o2, l2
    if final_shifts is not None:
        wf, bf = next_ref(), next_ref()
        t = mask_rows(_leaky(xv, slope), off, length)
        xv, off, length = apply_conv(t, off, length, final_shifts, wf, bf)
        xv = jnp.tanh(xv)
    rel = halo - off
    out[0] = lax.slice_in_dim(xv, rel, rel + t_tile, axis=0).astype(
        out.dtype)


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


def _receptive_radius(stacks, final) -> int:
    r = 0
    for st in stacks:
        r += (st["wd"].shape[0] - 1) // 2 * int(st["dilation"])
    if final is not None:
        r += (final[0].shape[0] - 1) // 2
    return r


def substitute_biases(stacks, final, c0):
    """Replace None biases with zeros so the packed kernels always have a
    bias ref (no-bias configs)."""

    def _b(bias, ch):
        return bias if bias is not None else jnp.zeros((ch,), jnp.float32)

    stacks = [dict(st, bd=_b(st["bd"], c0), b1=_b(st["b1"], c0),
                   bs=_b(st["bs"], c0)) for st in stacks]
    if final is not None:
        final = (final[0], _b(final[1], final[0].shape[-1]))
    return stacks, final


def prepare_packed(stacks, final, p: int, c0p: int):
    """Pack the chain's weights for the space-to-depth kernels.

    Returns (flat_w, stack_shifts, final_shifts, hl, hr): the stacked
    block-matrix weight list (per stack: wd, bd, w1, b1, ws, bs; then
    wf, bf with ``final``), per-stack (dilated, 1x1) shift tuples, the
    final conv's shift tuple (or None), and the chain's one-way packed-row
    margins."""
    flat_w = []
    stack_shifts = []
    hl = hr = 0
    for st in stacks:
        k, d = st["wd"].shape[0], int(st["dilation"])
        td = _conv_shift_table(k, d, p)
        sd = tuple(td.keys())
        md, bd = _pack_conv_weights(
            st["wd"].astype(jnp.float32), st["bd"].astype(jnp.float32),
            d, p, c0p)
        m1, b1 = _pack_conv_weights(
            st["w1"].astype(jnp.float32), st["b1"].astype(jnp.float32),
            1, p, c0p)
        ms, bs = _pack_conv_weights(
            st["ws"].astype(jnp.float32), st["bs"].astype(jnp.float32),
            1, p, c0p)
        flat_w += [jnp.stack([md[s] for s in sd]), bd,
                   jnp.stack([m1[0]]), b1, jnp.stack([ms[0]]), bs]
        stack_shifts.append((sd, (0,)))
        hl += -sd[0]
        hr += sd[-1]
    final_shifts = None
    if final is not None:
        fw, fb = final
        tf = _conv_shift_table(fw.shape[0], 1, p)
        final_shifts = tuple(tf.keys())
        mf, bfp = _pack_conv_weights(
            fw.astype(jnp.float32), fb.astype(jnp.float32), 1, p, c0p)
        flat_w += [jnp.stack([mf[s] for s in final_shifts]), bfp]
        hl += -final_shifts[0]
        hr += final_shifts[-1]
    return flat_w, stack_shifts, final_shifts, hl, hr


def fused_melgan_stacks(
    x, stacks, *, final=None, slope: float = 0.2,
    pad_mode: str = "reflect", t_tile: int = 512, interpret: bool = False,
):
    """Fused sequential ResidualStack chain: x (B, T, C<=128) -> (B, T, C)
    (or (B, T, out_ch) with ``final``). Exact vs the XLA twin including
    reflect/edge padding (edge stitching; see module docstring)."""
    interpret = interpret or jax.default_backend() != "tpu"
    b, t, c0 = x.shape
    stacks, final = substitute_biases(stacks, final, c0)

    # short inputs (t <= 2R) are entirely edge: the XLA twin computes the
    # whole output — skip the interior kernel launch/compile outright.
    r = _receptive_radius(stacks, final)
    if r > 0 and t <= 2 * r:
        return melgan_stacks_xla(x, stacks, final=final, slope=slope,
                                 pad_mode=pad_mode)

    y = fused_melgan_stacks_interior(
        x, stacks, final=final, slope=slope, t_tile=t_tile,
        interpret=interpret)

    # edge stitching: the fused interior assumed zero halos; recompute the
    # first/last R outputs with true (reflect/edge/constant) padding. The
    # 3R window makes the opposite window edge invisible to those outputs.
    if r > 0:
        w = min(3 * r, t)
        yl = melgan_stacks_xla(x[:, :w], stacks, final=final, slope=slope,
                               pad_mode=pad_mode)[:, :r]
        yr = melgan_stacks_xla(x[:, -w:], stacks, final=final, slope=slope,
                               pad_mode=pad_mode)[:, -r:]
        y = jnp.concatenate([yl, y[:, r:t - r], yr], axis=1)
    return y


def fused_melgan_stacks_interior(
    x, stacks, *, final=None, slope: float = 0.2, t_tile: int = 512,
    interpret: bool = False,
):
    """The fused chain with zero-pad ('same') edge semantics — exact in the
    interior (beyond the chain's receptive radius); biases must be arrays
    (``substitute_biases``)."""
    b, t, c0 = x.shape
    c0p = max(32, _pow2_at_least(c0))
    assert c0p <= LANES, "fused stacks need C <= 128"
    p = LANES // c0p

    flat_w, stack_shifts, final_shifts, hl, hr = prepare_packed(
        stacks, final, p, c0p)
    # bf16-RESIDENT mode (round 5): bf16 input keeps HBM traffic, DMA
    # and VMEM scratch bf16; dots run with bf16 operands + f32
    # accumulators; row geometry follows the bf16 sublane granule.
    io_dtype = (jnp.bfloat16 if x.dtype == jnp.bfloat16
                else jnp.float32)
    granule = 16 if io_dtype == jnp.bfloat16 else 8
    halo = _round_up(max(hl, hr, 1), granule)

    tile = min(t_tile, _round_up(-(-t // p), granule))
    n_tiles = -(-t // (p * tile))
    rows_total = n_tiles * tile
    xp = jnp.pad(
        x.astype(io_dtype),
        ((0, 0), (0, rows_total * p - t), (0, c0p - c0)),
    ).reshape(b, rows_total, LANES)
    xp = jnp.pad(xp, ((0, 0), (halo, halo), (0, 0)))

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for w in flat_w:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda bb, ii, nd=w.ndim: (0,) * nd),
            memory_space=pltpu.VMEM,
        ))
    kernel = functools.partial(
        _kernel_stacks, t_tile=tile, halo=halo, p=p, c0p=c0p,
        stack_shifts=tuple(stack_shifts), final_shifts=final_shifts,
        slope=slope, seq_len=t, n_weights=len(flat_w),
        mxu_bf16=io_dtype == jnp.bfloat16,
    )
    rows = tile + 2 * halo
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, LANES), lambda bb, ii: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows_total, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *flat_w)
    out_ch = final[0].shape[-1] if final is not None else c0
    return out.reshape(b, rows_total * p, c0p)[:, :t, :out_ch]
