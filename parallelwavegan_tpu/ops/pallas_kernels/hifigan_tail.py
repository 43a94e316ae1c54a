"""Fused HiFi-GAN decode tail: deconv -> MRF -> deconv -> MRF -> out conv.

Behavioral reference: the last two upsample stages + output convolution of
the HiFi-GAN generator (/root/reference/parallel_wavegan/models/hifigan.py
:173-207): per stage ``leaky -> ConvTranspose1d(k=2s, s) -> mean of MRF
resblocks``, then ``leaky(0.01) -> Conv1d(k) -> tanh``.

TPU design (extends the space-to-depth packing of hifigan_mrf.py): when a
stage halves the channel count while stride 2 doubles the sample count,
the product ``p * C`` is conserved — so the WHOLE tail lives at exactly
128 packed lanes. Each op (strided transposed conv included) becomes a
static set of packed-row shifts, each a dense ``(rows, 128) @ (128, 128)``
MXU matmul whose weight is a block matrix indexed by (input phase, output
phase, tap). One kernel invocation carries a time tile through every
stage with all intermediates resident in VMEM; the half-waveform
intermediates never touch HBM, and the 'same'/zero-pad edge semantics are
reproduced by masking out-of-sequence samples before every contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallelwavegan_tpu.ops.conv import conv_transpose1d
from parallelwavegan_tpu.ops.pallas_kernels.hifigan_mrf import (
    _conv_shift_table,
    _leaky,
    _round_up,
    hifigan_mrf_xla,
)
from parallelwavegan_tpu.ops.pallas_kernels.packing import (
    pack_block_bias,
    pack_block_weights,
)

LANES = 128


# --------------------------------------------------------------------------
# shift tables / weight packing
# --------------------------------------------------------------------------


def _deconv_shift_table(k: int, s: int, pad: int, p_in: int):
    """Static {row_shift: [(j_in, j_out, kk), ...]} for a gather-form
    transposed conv (ops/conv.py:74-101 semantics:
    ``y[j] = sum_k xd[j - (K-1) + pad + k] . kernel[k]`` with
    ``xd[s*i] = x[i]``) over p-packed rows; p_out = p_in * s."""
    p_out = p_in * s
    table = {}
    for j_out in range(p_out):
        for kk in range(k):
            num = j_out - (k - 1) + pad + kk
            if num % s:
                continue
            d_i = num // s
            srow, j_in = d_i // p_in, d_i % p_in
            table.setdefault(srow, []).append((j_in, j_out, kk))
    return dict(sorted(table.items()))


def _pack_weight(entries_by_shift, w, c0p_in: int, c0p_out: int):
    """taps (K, Cin, Cout) -> per-shift (128, 128) block matrices
    (single static-index gather; see packing.py)."""
    return pack_block_weights(
        entries_by_shift.values(), w, c0p_in, c0p_out, lanes=LANES
    )


def _pack_bias(b, p_out: int, c0p_out: int):
    return pack_block_bias(b.astype(jnp.float32), p_out, c0p_out,
                           lanes=LANES)


# --------------------------------------------------------------------------
# XLA twin (also the fallback path for equivalence tests)
# --------------------------------------------------------------------------


def hifigan_tail_xla(x, stages, final_w, final_b, slope: float = 0.1,
                     pre_blocks=None):
    """stages: [{deconv_w (K,Cin,Cout), deconv_b, stride, padding,
    blocks: [mrf block dicts]}]; final_w (K, C, out); pre_blocks: optional
    MRF at the input rate (run before the first stage)."""
    c = x
    if pre_blocks is not None:
        c = hifigan_mrf_xla(c, pre_blocks, slope)
    for st in stages:
        c = _leaky(c, slope)
        c = conv_transpose1d(
            c, st["deconv_w"], st["deconv_b"],
            stride=st["stride"], padding=st["padding"],
        )
        c = hifigan_mrf_xla(c, st["blocks"], slope)
    c = _leaky(c, 0.01)
    k = final_w.shape[0]
    pad = (k - 1) // 2
    c = lax.conv_general_dilated(
        c, final_w, (1,), [(pad, pad)],
        dimension_numbers=("NTC", "TIO", "NTC"),
    ) + final_b
    return jnp.tanh(c)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _kernel_tail(
    x_hbm,  # (B, rows_padded, 128) ANY
    *refs, t_tile: int, halo: int, pre_spec, stage_specs: tuple,
    final_spec: tuple, slope: float, n_weights: int,
):
    w_refs = refs[:n_weights]
    out = refs[n_weights]
    x_scratch = refs[n_weights + 1]
    sem = refs[n_weights + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = t_tile + 2 * halo

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * t_tile, rows), :], x_scratch, sem
    )
    dma.start()
    dma.wait()

    pos0 = i * t_tile - halo  # packed-row coordinate of buffer row 0

    def mask_rows(val, off, length, p, c0p, seq_len):
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
            contrib = jnp.dot(
                lax.slice_in_dim(src, s - s_min, s - s_min + new_len, axis=0),
                wmat_ref[si],
                preferred_element_type=jnp.float32,
            )
            z = contrib if z is None else z + contrib
        z = z + bias_ref[:][None, :]
        return z, off - s_min, new_len

    wi = 0

    def next_ref():
        nonlocal wi
        r = w_refs[wi]
        wi += 1
        return r

    def run_mrf(xv, off, length, block_specs, p, c0p, seq):
        results = []
        blk_refs = [
            [(next_ref(), next_ref(), next_ref(), next_ref())
             for _ in blk] for blk in block_specs
        ]
        for blk, refs_b in zip(block_specs, blk_refs):
            xb, ob, lb = xv, off, length
            for (s1, s2), (w1, b1, w2, b2) in zip(blk, refs_b):
                t1 = mask_rows(_leaky(xb, slope), ob, lb, p, c0p, seq)
                z, o1, l1 = apply_conv(t1, ob, lb, s1, w1, b1)
                t2 = mask_rows(_leaky(z, slope), o1, l1, p, c0p, seq)
                z2, o2, l2 = apply_conv(t2, o1, l1, s2, w2, b2)
                xb = lax.slice_in_dim(xb, o2 - ob, o2 - ob + l2, axis=0) + z2
                ob, lb = o2, l2
            results.append((xb, ob, lb))
        off_new = max(ob for _, ob, _ in results)
        end_new = min(ob + lb for _, ob, lb in results)
        acc = None
        for xb, ob, lb in results:
            sl = lax.slice_in_dim(
                xb, off_new - ob, off_new - ob + (end_new - off_new), axis=0
            )
            acc = sl if acc is None else acc + sl
        return acc / len(results), off_new, end_new - off_new

    xv = x_scratch[:]
    off, length = 0, rows
    if pre_spec is not None:
        pre_blocks, p0, c0p0, seq0 = pre_spec
        xv, off, length = run_mrf(xv, off, length, pre_blocks, p0, c0p0, seq0)
    for spec in stage_specs:
        (p_in, c0p_in, seq_in, dshifts, p_out, c0p_out, seq_out,
         block_specs) = spec
        wd, bd = next_ref(), next_ref()
        t = mask_rows(_leaky(xv, slope), off, length, p_in, c0p_in, seq_in)
        xv, off, length = apply_conv(t, off, length, dshifts, wd, bd)
        xv, off, length = run_mrf(xv, off, length, block_specs, p_out,
                                  c0p_out, seq_out)

    fshifts, p_last, c0p_last, seq_last = final_spec
    wf, bf = next_ref(), next_ref()
    t = mask_rows(_leaky(xv, 0.01), off, length, p_last, c0p_last, seq_last)
    y, o, _ = apply_conv(t, off, length, fshifts, wf, bf)
    y = jnp.tanh(y)
    rel = halo - o
    out[0] = lax.slice_in_dim(y, rel, rel + t_tile, axis=0).astype(out.dtype)


# --------------------------------------------------------------------------
# wrapper
# --------------------------------------------------------------------------


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _block_specs_and_weights(blocks, p, c0p, flat_w):
    """Shift specs + packed weights for one MRF; returns (specs, hl, hr)."""
    block_specs = []
    bhl = bhr = 0
    for blk in blocks:
        kb = int(blk["w1"].shape[1])
        spec = []
        cl = cr = 0
        for di, d in enumerate(blk["dilations"]):
            t1 = _conv_shift_table(kb, int(d), p)
            t2 = _conv_shift_table(kb, 1, p)
            s1, s2 = tuple(t1.keys()), tuple(t2.keys())
            spec.append((s1, s2))
            flat_w.append(_pack_weight(
                t1, blk["w1"][di].astype(jnp.float32), c0p, c0p))
            flat_w.append(_pack_bias(blk["b1"][di].astype(jnp.float32),
                                     p, c0p))
            flat_w.append(_pack_weight(
                t2, blk["w2"][di].astype(jnp.float32), c0p, c0p))
            flat_w.append(_pack_bias(blk["b2"][di].astype(jnp.float32),
                                     p, c0p))
            cl += -s1[0] - s2[0]
            cr += s1[-1] + s2[-1]
        block_specs.append(tuple(spec))
        bhl, bhr = max(bhl, cl), max(bhr, cr)
    return tuple(block_specs), bhl, bhr


def fused_hifigan_tail(
    x, stages, final_w, final_b, *, slope: float = 0.1, t_tile: int = 512,
    pre_blocks=None, interpret: bool = False,
):
    """x (B, T0, C0) -> (B, T0 * prod(strides), final_out_channels).

    Requires p*C == 128 lanes to be conserved through every stage
    (C0 a power of two <= 128, each stage Cout == Cin // stride).
    ``pre_blocks`` optionally runs an MRF at the input rate first (the
    stage whose deconv happened outside the kernel).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    b, t0, c0 = x.shape
    c0p = _pow2_at_least(c0)
    assert c0p <= LANES, "tail kernel needs C0 <= 128"
    p = LANES // c0p

    flat_w = []
    stage_specs = []
    hl = hr = 0
    seq = t0
    p_cur, c0p_cur = p, c0p

    pre_spec = None
    if pre_blocks is not None:
        specs, bhl, bhr = _block_specs_and_weights(pre_blocks, p, c0p, flat_w)
        pre_spec = (specs, p, c0p, t0)
        hl += bhl
        hr += bhr
    for st in stages:
        k, cin, cout = st["deconv_w"].shape
        s = int(st["stride"])
        p_out = p_cur * s
        c0p_out = LANES // p_out
        assert cout <= c0p_out, (
            f"stage Cout={cout} overflows packed lanes ({c0p_out})"
        )
        dt = _deconv_shift_table(k, s, int(st["padding"]), p_cur)
        dshifts = tuple(dt.keys())
        flat_w.append(_pack_weight(dt, st["deconv_w"].astype(jnp.float32),
                                   c0p_cur, c0p_out))
        flat_w.append(_pack_bias(st["deconv_b"].astype(jnp.float32),
                                 p_out, c0p_out))
        hl += -dshifts[0]
        hr += dshifts[-1]
        seq_out = seq * s

        block_specs, bhl, bhr = _block_specs_and_weights(
            st["blocks"], p_out, c0p_out, flat_w
        )
        hl += bhl
        hr += bhr
        stage_specs.append((
            p_cur, c0p_cur, seq, dshifts, p_out, c0p_out, seq_out,
            block_specs,
        ))
        p_cur, c0p_cur, seq = p_out, c0p_out, seq_out

    kf, c_last, out_ch = final_w.shape
    assert out_ch <= c0p_cur
    tf = _conv_shift_table(kf, 1, p_cur)
    fshifts = tuple(tf.keys())
    flat_w.append(_pack_weight(tf, final_w.astype(jnp.float32),
                               c0p_cur, c0p_cur))
    flat_w.append(_pack_bias(final_b.astype(jnp.float32), p_cur, c0p_cur))
    hl += -fshifts[0]
    hr += fshifts[-1]
    final_spec = (fshifts, p_cur, c0p_cur, seq)

    halo = _round_up(max(hl, hr), 8)

    # pack input: pad channels to c0p, pad rows to tile grid + halo
    t_tile = min(t_tile, _round_up(-(-t0 // p), 8))
    n_tiles = -(-t0 // (p * t_tile))
    rows_total = n_tiles * t_tile
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (0, rows_total * p - t0), (0, c0p - c0)),
    ).reshape(b, rows_total, LANES)
    xp = jnp.pad(xp, ((0, 0), (halo, halo), (0, 0)))

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for w in flat_w:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda bb, ii, nd=w.ndim: (0,) * nd),
            memory_space=pltpu.VMEM,
        ))

    kernel = functools.partial(
        _kernel_tail, t_tile=t_tile, halo=halo, pre_spec=pre_spec,
        stage_specs=tuple(stage_specs), final_spec=final_spec,
        slope=slope, n_weights=len(flat_w),
    )
    rows = t_tile + 2 * halo
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_tile, LANES), lambda bb, ii: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows_total, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *flat_w)
    # unpack: sample j lives at row j // p_last, lanes (j % p_last)*c0p_last
    out = out.reshape(b, rows_total * p_cur, c0p_cur)
    return out[:, :seq, :out_ch]
