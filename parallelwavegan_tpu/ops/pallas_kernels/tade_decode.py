"""Fused StyleMelGAN TADEResBlock decode kernels (space-to-depth packed).

A TADEResBlock (reference layers/tade_res_block.py:75-160) is six k=9
convs at C=64 plus instance norms, gated softmax*tanh activations and
nearest x2 upsampling. Run as XLA ops at decode lengths (the last blocks
process 33k-135k samples), every conv re-reads and re-writes the full
64-channel activation from HBM — the stage is bandwidth-bound exactly
like the HiFi-GAN C<=64 MRF stages (hifigan_mrf.py). This module fuses
each block into TWO Pallas kernels that keep all intermediates in VMEM:

  * kernel 1 (``_kernel_tade1``): instance-norm modulate (TADE 1) +
    gated_conv1 softmax*tanh — 5 packed convs (aux, 2x gate halves,
    2x gated_conv1 halves);
  * kernel 2 (``_kernel_tade2``): nearest-x2 upsample + TADE 2 +
    dilated gated_conv2 + residual — 5 packed convs at the output rate.

The split exists because each TADE's instance norm is a GLOBAL
time-reduction of an activation produced inside the block: the per
(batch, channel) mean/rsqrt are computed between the kernels as two tiny
XLA reductions over the packed layout and fed in as vectors.

Packing: p = 2 consecutive samples share the 128-lane dimension
(c0p = 64), so every conv tap is a dense (rows, 128) @ (128, 128) MXU
matmul via the shift tables of hifigan_mrf.py. The 2C = 128-channel gate
convs are computed as two 64-out packed convs (one per gate half). The
channel softmax of the gated activation subtracts the per-phase-group
row max (``_group_max`` — a shared per-row constant would let the other
phase underflow to ssum=0), exponentiates, and divides by the per-phase
group sum obtained with one block-diagonal ones matmul.

Weights arrive FOLDED (weight norm applied), in lax.conv "TIO" layout
(K, Cin, Cout), exactly what ``Conv1d(..., return_params=True)`` yields.

Inference-only; the training twin with fused custom_vjp backward kernels
is ops/pallas_kernels/tade_train.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallelwavegan_tpu.layers.tade import instance_norm_1d
from parallelwavegan_tpu.layers.upsample import stretch_time
from parallelwavegan_tpu.ops.pallas_kernels.hifigan_mrf import (
    _conv_shift_table,
    _pack_conv_weights,
    _round_up,
)

LANES = 128
C0P = 64  # StyleMelGAN channels
P = LANES // C0P  # 2 samples per packed row


# ---------------------------------------------------------------------------
# XLA twin (also the fallback for short blocks / the 80-ch first aux conv)
# ---------------------------------------------------------------------------


def _conv(x, w, b, d: int = 1):
    k = w.shape[0]
    pad = (k - 1) // 2 * d
    # harmonize dtypes: bf16 activations with caller-kept f32 weights
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(pad, pad)], rhs_dilation=(d,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    ) + b.astype(x.dtype)


def _gate(xa, xb, gated_function: str):
    if gated_function == "softmax":
        return jax.nn.softmax(xa, axis=-1) * jnp.tanh(xb)
    return jax.nn.sigmoid(xa) * jnp.tanh(xb)


def tade_block_xla(x, c, blk, *, gated_function: str = "softmax"):
    """One TADEResBlock on folded weights. x (B,T,C), c (B,T,Ca).

    Returns (x_out (B, T*scale, C), c_out (B, T*scale, C)); mirrors
    layers/tade.py TADEResBlock given the same effective weights.
    """
    s, d = int(blk["scale"]), int(blk["dilation"])
    residual = x
    xn = instance_norm_1d(x)
    a = _conv(c, blk["aux1_w"], blk["aux1_b"])
    cg = _conv(a, blk["g1_w"], blk["g1_b"])
    cg1, cg2 = jnp.split(cg, 2, axis=-1)
    y = cg1 * xn + cg2
    t = _conv(y, blk["gc1_w"], blk["gc1_b"])
    xa, xb = jnp.split(t, 2, axis=-1)
    x2 = _gate(xa, xb, gated_function)

    xn2 = instance_norm_1d(x2)
    cu = stretch_time(a, s)
    a2 = _conv(cu, blk["aux2_w"], blk["aux2_b"])
    cg = _conv(a2, blk["g2_w"], blk["g2_b"])
    cg1, cg2 = jnp.split(cg, 2, axis=-1)
    y2 = cg1 * stretch_time(xn2, s) + cg2
    t2 = _conv(y2, blk["gc2_w"], blk["gc2_b"], d=d)
    xa, xb = jnp.split(t2, 2, axis=-1)
    return stretch_time(residual, s) + _gate(xa, xb, gated_function), a2


# ---------------------------------------------------------------------------
# packed helpers
# ---------------------------------------------------------------------------


def _pack_time(x, t_rows: int):
    """(B, T, C<=C0P) -> (B, t_rows, 128), zero padded."""
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, t_rows * P - t), (0, C0P - c)))
    return xp.reshape(b, t_rows, LANES)


def _unpack_time(xp, t: int, c: int):
    b, rows, _ = xp.shape
    return xp.reshape(b, rows * P, C0P)[:, :t, :c]


def _packed_stats(xp, t: int):
    """Per (batch, lane) instance-norm mean/rsqrt of a packed activation.

    Phase copies of one channel are averaged together (both phases hold
    the same channel), then broadcast back to the packed lane layout, so
    the kernels can normalize with one FMA per element.
    """
    rows = t // P  # t is always a multiple of P here
    # f32 accumulation even for bf16-resident packed activations
    v = xp[:, :rows, :].astype(jnp.float32)
    mean_l = jnp.mean(v, axis=1)  # (B, 128)
    sq_l = jnp.mean(v * v, axis=1)
    mean_c = 0.5 * (mean_l[:, :C0P] + mean_l[:, C0P:])
    sq_c = 0.5 * (sq_l[:, :C0P] + sq_l[:, C0P:])
    var_c = sq_c - mean_c * mean_c
    rs_c = lax.rsqrt(jnp.maximum(var_c, 0.0) + 1e-5)
    mean = jnp.concatenate([mean_c, mean_c], axis=-1)
    rs = jnp.concatenate([rs_c, rs_c], axis=-1)
    return mean, rs


def _split_gate_weights(w, b):
    """(9, C, 2C) gate conv -> two (9, C, C) convs (one per gate half)."""
    c = w.shape[1]
    return (w[:, :, :c], b[:c]), (w[:, :, c:], b[c:])


def _group_ones():
    """(128, 128) block-diagonal ones: per-phase channel-group sum."""
    eye2 = jnp.eye(P, dtype=jnp.float32)
    return jnp.kron(eye2, jnp.ones((C0P, C0P), jnp.float32))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _mask_rows(val, pos0, off, length, seq_len):
    row = lax.broadcasted_iota(jnp.int32, (length, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (length, LANES), 1)
    samp = (pos0 + off + row) * P + lane // C0P
    ok = (samp >= 0) & (samp < seq_len)
    return jnp.where(ok, val, jnp.zeros_like(val))


def _apply_conv(src, off, length, shifts, wmat_ref, bias_ref,
                mxu_bf16: bool = False):
    """Packed conv as shifted matmuls. ``mxu_bf16`` casts the dot
    operands to bfloat16 (f32 accumulation via preferred_element_type):
    2x MXU rate, matching XLA's own matmul precision under
    ``mixed_precision: true``. Memory layouts stay f32."""
    s_min, s_max = shifts[0], shifts[-1]
    new_len = length - (s_max - s_min)
    z = None
    for si, s in enumerate(shifts):
        lhs = lax.slice_in_dim(src, s - s_min, s - s_min + new_len, axis=0)
        rhs = wmat_ref[si]
        if mxu_bf16:
            lhs = lhs.astype(jnp.bfloat16)
            rhs = rhs.astype(jnp.bfloat16)
        contrib = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        z = contrib if z is None else z + contrib
    return z + bias_ref[:][None, :], off - s_min, new_len


def _group_max(xa):
    """Per-phase-group row max, broadcast to the packed lane layout.

    The stabilizing constant must come from the same channel group the
    softmax sums over: a single per-row max would let the OTHER phase's
    exponentials underflow to all-zero (ssum=0 -> NaN) whenever the two
    packed samples' logits differ by more than ~88. Implemented with
    full-width masked reductions + a lane select (lane slicing + concat
    produces layouts Mosaic cannot re-tile).
    """
    lane = lax.broadcasted_iota(jnp.int32, xa.shape, xa.ndim - 1)
    is_lo = lane < C0P
    ninf = jnp.full_like(xa, -jnp.inf)
    lo = jnp.max(jnp.where(is_lo, xa, ninf), axis=-1, keepdims=True)
    hi = jnp.max(jnp.where(is_lo, ninf, xa), axis=-1, keepdims=True)
    return jnp.where(is_lo, lo, hi)


def _softmax_tanh(xa, xb, ones_ref, gated_function: str):
    if gated_function == "softmax":
        e = jnp.exp(xa - _group_max(xa))
        ssum = jnp.dot(e, ones_ref[:], preferred_element_type=jnp.float32)
        g = e / ssum
    else:
        g = jax.nn.sigmoid(xa)
    return g * jnp.tanh(xb)


def _kernel_tade1(
    x_hbm, c_hbm, mean_ref, rs_ref, *refs, t_tile: int, halo: int,
    shifts9: tuple, seq_len: int, gated_function: str,
    mxu_bf16: bool = False,
):
    (w_aux, b_aux, w_g1a, b_g1a, w_g1b, b_g1b, w_c1a, b_c1a, w_c1b, b_c1b,
     ones_ref, x_out, c_out, x_scr, c_scr, sem_x, sem_c) = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = t_tile + 2 * halo
    dx = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * t_tile, rows), :], x_scr, sem_x)
    dx.start()
    dc = pltpu.make_async_copy(
        c_hbm.at[b, pl.ds(i * t_tile, rows), :], c_scr, sem_c)
    dc.start()
    dx.wait()
    dc.wait()

    pos0 = i * t_tile - halo
    mean = mean_ref[b][None, :]
    rs = rs_ref[b][None, :]

    xn = (x_scr[:] - mean) * rs  # (rows, 128)

    cv = _mask_rows(c_scr[:], pos0, 0, rows, seq_len)
    a, off_a, len_a = _apply_conv(cv, 0, rows, shifts9, w_aux, b_aux,
                                  mxu_bf16)
    am = _mask_rows(a, pos0, off_a, len_a, seq_len)
    cg1, off_g, len_g = _apply_conv(am, off_a, len_a, shifts9, w_g1a, b_g1a,
                                    mxu_bf16)
    cg2, _, _ = _apply_conv(am, off_a, len_a, shifts9, w_g1b, b_g1b,
                            mxu_bf16)
    xn_s = lax.slice_in_dim(xn, off_g, off_g + len_g, axis=0)
    y = cg1 * xn_s + cg2
    ym = _mask_rows(y, pos0, off_g, len_g, seq_len)
    xa, off_t, len_t = _apply_conv(ym, off_g, len_g, shifts9, w_c1a, b_c1a,
                                   mxu_bf16)
    xb, _, _ = _apply_conv(ym, off_g, len_g, shifts9, w_c1b, b_c1b,
                           mxu_bf16)
    x2 = _softmax_tanh(xa, xb, ones_ref, gated_function)

    rel = halo - off_t
    x_out[0] = lax.slice_in_dim(x2, rel, rel + t_tile, axis=0).astype(
        x_out.dtype)
    rel_a = halo - off_a
    c_out[0] = lax.slice_in_dim(a, rel_a, rel_a + t_tile, axis=0).astype(
        c_out.dtype)


def _kernel_tade2(
    x_hbm, c_hbm, r_hbm, mean_ref, rs_ref, *refs, t_tile_in: int,
    halo_in: int, scale: int, shifts9: tuple, shifts_d: tuple,
    seq_out: int, gated_function: str, mxu_bf16: bool = False,
):
    (w_aux, b_aux, w_g2a, b_g2a, w_g2b, b_g2b, w_c2a, b_c2a, w_c2b, b_c2b,
     ones_ref, x_out, c_out, x_scr, c_scr, r_scr, sem_x, sem_c,
     sem_r) = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows_in = t_tile_in + 2 * halo_in
    for hbm, scr, sem in ((x_hbm, x_scr, sem_x), (c_hbm, c_scr, sem_c),
                          (r_hbm, r_scr, sem_r)):
        dma = pltpu.make_async_copy(
            hbm.at[b, pl.ds(i * t_tile_in, rows_in), :], scr, sem)
        dma.start()
        dma.wait()

    mean = mean_ref[b][None, :]
    rs = rs_ref[b][None, :]
    xn2 = (x_scr[:] - mean) * rs

    def stretch(v):
        """packed nearest-x2: in row r (phases p0,p1) -> out rows 2r, 2r+1
        = (p0,p0), (p1,p1)."""
        if scale == 1:
            return v
        lo, hi = v[:, :C0P], v[:, C0P:]
        e0 = jnp.concatenate([lo, lo], axis=-1)
        e1 = jnp.concatenate([hi, hi], axis=-1)
        n = v.shape[0]
        return jnp.stack([e0, e1], axis=1).reshape(2 * n, LANES)

    # output-rate coordinates: input tile row 0 is at packed-out row
    # scale * (i*t_tile_in - halo_in)
    pos0 = scale * (i * t_tile_in - halo_in)
    rows = scale * rows_in

    up = stretch(xn2)
    cu = stretch(c_scr[:])
    ru = stretch(r_scr[:])

    cv = _mask_rows(cu, pos0, 0, rows, seq_out)
    a2, off_a, len_a = _apply_conv(cv, 0, rows, shifts9, w_aux, b_aux,
                                   mxu_bf16)
    am = _mask_rows(a2, pos0, off_a, len_a, seq_out)
    cg1, off_g, len_g = _apply_conv(am, off_a, len_a, shifts9, w_g2a, b_g2a,
                                    mxu_bf16)
    cg2, _, _ = _apply_conv(am, off_a, len_a, shifts9, w_g2b, b_g2b,
                            mxu_bf16)
    up_s = lax.slice_in_dim(up, off_g, off_g + len_g, axis=0)
    y = cg1 * up_s + cg2
    ym = _mask_rows(y, pos0, off_g, len_g, seq_out)
    xa, off_t, len_t = _apply_conv(ym, off_g, len_g, shifts_d, w_c2a, b_c2a,
                                   mxu_bf16)
    xb, _, _ = _apply_conv(ym, off_g, len_g, shifts_d, w_c2b, b_c2b,
                           mxu_bf16)
    g = _softmax_tanh(xa, xb, ones_ref, gated_function)
    r_s = lax.slice_in_dim(ru, off_t, off_t + len_t, axis=0)
    xo = r_s + g

    t_tile_out = scale * t_tile_in
    halo_out = scale * halo_in
    rel = halo_out - off_t
    x_out[0] = lax.slice_in_dim(xo, rel, rel + t_tile_out, axis=0).astype(
        x_out.dtype)
    rel_a = halo_out - off_a
    c_out[0] = lax.slice_in_dim(a2, rel_a, rel_a + t_tile_out,
                                axis=0).astype(c_out.dtype)


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def _vmem_specs(ws):
    return [
        pl.BlockSpec(w.shape, (lambda bb, ii, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]


def _stacked(w, b, d: int):
    mats, bias = _pack_conv_weights(
        w.astype(jnp.float32), b.astype(jnp.float32), d, P, C0P)
    shifts = tuple(sorted(mats))
    return shifts, jnp.stack([mats[s] for s in shifts]), bias


def _pad_halo(xp, halo: int):
    return jnp.pad(xp, ((0, 0), (halo, halo), (0, 0)))


def _run_tade1(xp, cp, t, blk, *, t_tile, gated_function, interpret,
               mxu_bf16=False):
    b, rows_tot, _ = xp.shape
    # bf16-RESIDENT mode (round 5): when the packed arrays arrive in
    # bfloat16 the HBM traffic, DMA and VMEM scratch all stay bf16 —
    # the stated bf16-regime limiter of the r4 kernels (KERNELS.md).
    # Row geometry then follows the bf16 sublane granule (16).
    io_dtype = xp.dtype
    granule = 16 if io_dtype == jnp.bfloat16 else 8
    halo = 8
    shifts9, w_aux, b_aux = _stacked(blk["aux1_w"], blk["aux1_b"], 1)
    (w1a, b1a), (w1b, b1b) = _split_gate_weights(blk["g1_w"], blk["g1_b"])
    _, wg1a, bg1a = _stacked(w1a, b1a, 1)
    _, wg1b, bg1b = _stacked(w1b, b1b, 1)
    (wc1a_, bc1a_), (wc1b_, bc1b_) = _split_gate_weights(
        blk["gc1_w"], blk["gc1_b"])
    _, wc1a, bc1a = _stacked(wc1a_, bc1a_, 1)
    _, wc1b, bc1b = _stacked(wc1b_, bc1b_, 1)
    mean, rs = _packed_stats(xp, t)
    ones = _group_ones()

    tile = min(t_tile, _round_up(rows_tot, granule))
    n_tiles = -(-rows_tot // tile)
    t_rows = n_tiles * tile
    xp_p = _pad_halo(jnp.pad(xp, ((0, 0), (0, t_rows - rows_tot), (0, 0))),
                     halo)
    cp_p = _pad_halo(jnp.pad(cp, ((0, 0), (0, t_rows - rows_tot), (0, 0))),
                     halo)
    ws = [w_aux, b_aux, wg1a, bg1a, wg1b, bg1b, wc1a, bc1a, wc1b, bc1b,
          ones]
    kernel = functools.partial(
        _kernel_tade1, t_tile=tile, halo=halo, shifts9=shifts9,
        seq_len=t, gated_function=gated_function, mxu_bf16=mxu_bf16,
    )
    rows = tile + 2 * halo
    x2, c2 = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY),
             pl.BlockSpec(memory_space=pltpu.ANY),
             pl.BlockSpec(mean.shape, lambda bb, ii: (0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec(mean.shape, lambda bb, ii: (0, 0),
                          memory_space=pltpu.VMEM)]
            + _vmem_specs(ws)
        ),
        out_specs=[
            pl.BlockSpec((1, tile, LANES), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, LANES), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_rows, LANES), xp.dtype),
            jax.ShapeDtypeStruct((b, t_rows, LANES), xp.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp_p, cp_p, mean, rs, *ws)
    return x2[:, :rows_tot], c2[:, :rows_tot]


def _run_tade2(x2p, c2p, rp, t, blk, *, t_tile, gated_function,
               interpret, mxu_bf16=False):
    b, rows_tot, _ = x2p.shape
    io_dtype = x2p.dtype
    granule = 16 if io_dtype == jnp.bfloat16 else 8
    scale, d = int(blk["scale"]), int(blk["dilation"])
    halo_in = 8 // scale if scale > 1 else 8
    if io_dtype == jnp.bfloat16:
        # keep DMA row offsets/lengths on the bf16 sublane granule
        halo_in = granule
    shifts9_t = _conv_shift_table(9, 1, P)
    shifts9 = tuple(sorted(shifts9_t))
    _, w_aux, b_aux = _stacked(blk["aux2_w"], blk["aux2_b"], 1)
    (w2a, b2a), (w2b, b2b) = _split_gate_weights(blk["g2_w"], blk["g2_b"])
    _, wg2a, bg2a = _stacked(w2a, b2a, 1)
    _, wg2b, bg2b = _stacked(w2b, b2b, 1)
    (wc2a_, bc2a_), (wc2b_, bc2b_) = _split_gate_weights(
        blk["gc2_w"], blk["gc2_b"])
    shifts_d, wc2a, bc2a = _stacked(wc2a_, bc2a_, d)
    _, wc2b, bc2b = _stacked(wc2b_, bc2b_, d)
    mean, rs = _packed_stats(x2p, t)
    ones = _group_ones()

    tile_in = min(t_tile, _round_up(rows_tot, granule))
    n_tiles = -(-rows_tot // tile_in)
    t_rows_in = n_tiles * tile_in

    def prep(a):
        return _pad_halo(
            jnp.pad(a, ((0, 0), (0, t_rows_in - rows_tot), (0, 0))),
            halo_in)

    ws = [w_aux, b_aux, wg2a, bg2a, wg2b, bg2b, wc2a, bc2a, wc2b, bc2b,
          ones]
    kernel = functools.partial(
        _kernel_tade2, t_tile_in=tile_in, halo_in=halo_in, scale=scale,
        shifts9=shifts9, shifts_d=shifts_d, seq_out=t * scale,
        gated_function=gated_function, mxu_bf16=mxu_bf16,
    )
    rows_in = tile_in + 2 * halo_in
    tile_out = scale * tile_in
    x3, c3 = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY)] * 3
            + [pl.BlockSpec(mean.shape, lambda bb, ii: (0, 0),
                            memory_space=pltpu.VMEM)] * 2
            + _vmem_specs(ws)
        ),
        out_specs=[
            pl.BlockSpec((1, tile_out, LANES), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_out, LANES), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, scale * t_rows_in, LANES), x2p.dtype),
            jax.ShapeDtypeStruct((b, scale * t_rows_in, LANES), x2p.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_in, LANES), io_dtype),
            pltpu.VMEM((rows_in, LANES), io_dtype),
            pltpu.VMEM((rows_in, LANES), io_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(prep(x2p), prep(c2p), prep(rp), mean, rs, *ws)
    rows_out = scale * rows_tot
    return x3[:, :rows_out], c3[:, :rows_out]


def fused_tade_blocks(
    x, c, blocks, *, gated_function: str = "softmax",
    min_fused_t: int = 4096, t_tile: int = 1024, interpret: bool = False,
):
    """Run a stack of TADEResBlocks; long blocks through the fused kernels.

    x (B, T0, 64), c (B, T0, Ca). ``blocks``: list of folded-weight dicts
    (see tade_block_xla). Blocks whose input length is below
    ``min_fused_t`` (or whose aux width != 64, i.e. the first mel-fed
    block) run the XLA twin — at short lengths the pack/launch overhead
    exceeds the fusion win (cf. hifigan_mrf.py round-1 notes).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    packed = False
    xp = cp = None
    for blk in blocks:
        t = x.shape[1] if not packed else t_cur
        use_kernel = t >= min_fused_t and blk["aux1_w"].shape[1] == C0P
        if not use_kernel:
            if packed:
                x = _unpack_time(xp, t_cur, C0P)
                c = _unpack_time(cp, t_cur, C0P)
                packed = False
            x, c = tade_block_xla(x, c, blk, gated_function=gated_function)
            continue
        if not packed:
            t_cur = x.shape[1]
            rows = -(-t_cur // P)
            xp = _pack_time(x, rows)
            cp = _pack_time(c, rows)
            packed = True
        x2p, c2p = _run_tade1(
            xp, cp, t_cur, blk, t_tile=t_tile,
            gated_function=gated_function, interpret=interpret,
        )
        x3p, c3p = _run_tade2(
            x2p, c2p, xp, t_cur, blk, t_tile=t_tile,
            gated_function=gated_function, interpret=interpret,
        )
        xp, cp = x3p, c3p
        t_cur = t_cur * int(blk["scale"])
    if packed:
        x = _unpack_time(xp, t_cur, C0P)
        c = _unpack_time(cp, t_cur, C0P)
    return x, c
