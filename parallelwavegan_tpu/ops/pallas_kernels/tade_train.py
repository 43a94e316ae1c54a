"""Training-capable fused TADEResBlock: custom_vjp over the decode kernels.

Forward: the two packed decode kernels (ops/pallas_kernels/tade_decode.py
``_run_tade1``/``_run_tade2``) — instance-norm stats as tiny XLA
reductions between them, every conv a dense (rows, 128) @ (128, 128) MXU
matmul with 2 samples space-to-depth packed into the 128 lanes.

Backward: two fused reverse kernels that, per (batch, tile) grid step,
RECOMPUTE the stage's forward inside a halo'd tile (exactly the decode
kernels' op order, so recomputed activations match) and then walk the
stage in reverse producing dx/dc/dweights in the same call — the
``wavenet_stack_train.py`` recipe. The pieces the kernels cannot do
tile-locally are the two instance norms, whose backward needs GLOBAL
per-(batch, channel) time reductions:

    x -> IN -> xn          dL/dx = r * (dxn - E[dxn] - xn_hat * E[dxn*xn_hat])

so each reverse kernel emits the grad w.r.t. the NORMALIZED activation
(dxn) and the rank-1 correction runs as two packed XLA reductions between
kernels (``_in_bwd_packed``), mirroring how the forward computes stats.

Weight grads are accumulated in-kernel as packed-block-matrix grads
(owned-row masked so grid steps contribute disjoint partial sums into
revisited VMEM output blocks — the TPU grid is sequential) and mapped
back to (K, Cin, Cout) tap layout by the adjoint of the shift-table
packing (``_unpack_wgrad``).

Halo correctness: stage 1 chains three k=9 convs (spread 2 packed rows
per side each) -> one-way margin 6 rows; the reverse conv-transposes add
the same again, so halo = 16 rows (rounded to the f32 sublane multiple)
makes center-tile dx/dc exact. Stage 2 at the output rate chains
conv9+conv9+dilated conv9 (spread 2+2+2d rows) -> halo_out = 8+4d rows,
loaded as ceil(halo_out/scale) input rows.

Behavioral reference for the block math:
/root/reference/parallel_wavegan/layers/tade_res_block.py:75-160.
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
    _round_up,
)
from parallelwavegan_tpu.ops.pallas_kernels.tade_decode import (
    C0P,
    LANES,
    P,
    _apply_conv,
    _group_max,
    _group_ones,
    _mask_rows,
    _pack_time,
    _packed_stats,
    _pad_halo,
    _run_tade1,
    _run_tade2,
    _split_gate_weights,
    _stacked,
    _unpack_time,
    tade_block_xla,
)

_WEIGHT_KEYS = (
    "aux1_w", "aux1_b", "g1_w", "g1_b", "gc1_w", "gc1_b",
    "aux2_w", "aux2_b", "g2_w", "g2_b", "gc2_w", "gc2_b",
)


# ---------------------------------------------------------------------------
# packed XLA glue: instance-norm backward, stretch transpose, weight unpack
# ---------------------------------------------------------------------------


def _phase_mean(v):
    """(B, rows, 128) -> per-(batch, channel) mean over T, lane layout."""
    m = jnp.mean(v, axis=1)
    mc = 0.5 * (m[:, :C0P] + m[:, C0P:])
    return jnp.concatenate([mc, mc], axis=-1)


def _in_bwd_packed(dyn, xp, mean, rs, t):
    """Instance-norm backward in packed layout.

    dyn: grad w.r.t. the normalized value (B, >=t//P, 128); xp: the raw
    IN input; mean/rs: its packed stats. Returns dL/dx (B, t//P, 128)
    in dyn's dtype (f32 internally for the rank-1 reductions).
    """
    rows = t // P
    out_dtype = dyn.dtype
    dyn = dyn[:, :rows, :].astype(jnp.float32)
    xv = xp[:, :rows, :].astype(jnp.float32)
    xn = (xv - mean[:, None, :]) * rs[:, None, :]
    e1 = _phase_mean(dyn)
    e2 = _phase_mean(dyn * xn)
    out = rs[:, None, :] * (dyn - e1[:, None, :] - xn * e2[:, None, :])
    return out.astype(out_dtype)


def _stretch_t_packed(z, scale: int):
    """Adjoint of the packed nearest-x2 stretch: (B, 2R, 128)->(B, R, 128).

    Forward maps in-row r (phases p0, p1) to out rows (2r: p0,p0),
    (2r+1: p1,p1); the adjoint sums each pair of copies back.
    """
    if scale == 1:
        return z
    b, rows, _ = z.shape
    v = z.reshape(b, rows // 2, 2, LANES)
    lo = v[:, :, 0, :C0P] + v[:, :, 0, C0P:]
    hi = v[:, :, 1, :C0P] + v[:, :, 1, C0P:]
    return jnp.concatenate([lo, hi], axis=-1)


def _unpack_wgrad(dmats, dbias, k: int, d: int):
    """Adjoint of ``_stacked``'s packing: block-matrix grads -> tap grads."""
    table = _conv_shift_table(k, d, P)
    dw = jnp.zeros((k, C0P, C0P), jnp.float32)
    for si, s in enumerate(sorted(table)):
        for j_in, j_out, kk in table[s]:
            blk = lax.slice(
                dmats[si],
                (j_in * C0P, j_out * C0P),
                (j_in * C0P + C0P, j_out * C0P + C0P),
            )
            dw = dw.at[kk].add(blk)
    db = dbias[0, :C0P] + dbias[0, C0P:]
    return dw, db


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _owned_rows(val, pos0, off, length, lo_rows, hi_rows, seq_len):
    """Zero all but this tile's owned, in-sequence rows (sample-level)."""
    row = lax.broadcasted_iota(jnp.int32, (length, LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (length, LANES), 1)
    samp = (pos0 + off + row) * P + lane // C0P
    ok = (
        (samp >= lo_rows * P) & (samp < hi_rows * P)
        & (samp >= 0) & (samp < seq_len)
    )
    return jnp.where(ok, val, jnp.zeros_like(val))


def _gate_vjp(xa, xb, dg, ones_ref, gated_function: str):
    """VJP of softmax(xa)*tanh(xb) (channel-group softmax) or sigmoid gate."""
    th = jnp.tanh(xb)
    if gated_function == "softmax":
        e = jnp.exp(xa - _group_max(xa))
        ssum = jnp.dot(e, ones_ref[:], preferred_element_type=jnp.float32)
        p = e / ssum
        u = dg * th
        su = jnp.dot(u * p, ones_ref[:], preferred_element_type=jnp.float32)
        dxa = p * (u - su)
    else:
        p = jax.nn.sigmoid(xa)
        dxa = dg * th * p * (1.0 - p)
    dxb = dg * p * (1.0 - th * th)
    return dxa, dxb


def _apply_conv_t(dz, new_len, length, shifts, wmat_ref,
                  mxu_bf16: bool = False):
    """Adjoint of ``_apply_conv`` w.r.t. its input frame (length rows)."""
    s_min = shifts[0]
    out = None
    dz_c = dz.astype(jnp.bfloat16) if mxu_bf16 else dz
    for si, s in enumerate(shifts):
        w_t = wmat_ref[si].T
        if mxu_bf16:
            w_t = w_t.astype(jnp.bfloat16)
        contrib = jnp.dot(dz_c, w_t,
                          preferred_element_type=jnp.float32)
        placed = jnp.pad(
            contrib, ((s - s_min, length - new_len - (s - s_min)), (0, 0))
        )
        out = placed if out is None else out + placed
    return out


def _conv_wgrads(src, dz_own, new_len, shifts, dw_ref, db_ref,
                 mxu_bf16: bool = False):
    """Accumulate packed-matrix + bias grads for one conv into out refs.

    With ``mxu_bf16`` the dot operands are bfloat16 but the accumulator
    refs stay f32 (grid-step partial sums accumulate in full precision).
    """
    s_min = shifts[0]
    dz_c = dz_own.astype(jnp.bfloat16) if mxu_bf16 else dz_own
    for si, s in enumerate(shifts):
        lhs = lax.slice_in_dim(
            src, s - s_min, s - s_min + new_len, axis=0).T
        if mxu_bf16:
            lhs = lhs.astype(jnp.bfloat16)
        dw_ref[si] += jnp.dot(lhs, dz_c, preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dz_own.astype(jnp.float32), axis=0)


def _stretch_2d(v, scale: int):
    """Packed nearest-x2 on a 2-D (rows, 128) value (decode kernel's)."""
    if scale == 1:
        return v
    lo, hi = v[:, :C0P], v[:, C0P:]
    e0 = jnp.concatenate([lo, lo], axis=-1)
    e1 = jnp.concatenate([hi, hi], axis=-1)
    n = v.shape[0]
    return jnp.stack([e0, e1], axis=1).reshape(2 * n, LANES)


# ---------------------------------------------------------------------------
# reverse kernels
# ---------------------------------------------------------------------------


def _kernel_tade1_bwd(
    x_hbm, c_hbm, dx2_hbm, da_hbm, mean_ref, rs_ref, *refs,
    t_tile: int, halo: int, shifts9: tuple, seq_len: int,
    gated_function: str, mxu_bf16: bool = False,
):
    (w_aux, b_aux, w_g1a, b_g1a, w_g1b, b_g1b, w_c1a, b_c1a, w_c1b, b_c1b,
     ones_ref,
     dxn_out, dc_out,
     dw_aux, db_aux, dw_g1a, db_g1a, dw_g1b, db_g1b,
     dw_c1a, db_c1a, dw_c1b, db_c1b,
     x_scr, c_scr, dx2_scr, da_scr, s0, s1, s2, s3) = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * pl.num_programs(1) + i

    @pl.when(step == 0)
    def _():
        for ref in (dw_aux, db_aux, dw_g1a, db_g1a, dw_g1b, db_g1b,
                    dw_c1a, db_c1a, dw_c1b, db_c1b):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    apply_conv = functools.partial(_apply_conv, mxu_bf16=mxu_bf16)
    apply_conv_t = functools.partial(_apply_conv_t,
                                     mxu_bf16=mxu_bf16)
    conv_wgrads = functools.partial(_conv_wgrads,
                                    mxu_bf16=mxu_bf16)

    rows = t_tile + 2 * halo
    for hbm, scr, sem in ((x_hbm, x_scr, s0), (c_hbm, c_scr, s1),
                          (dx2_hbm, dx2_scr, s2), (da_hbm, da_scr, s3)):
        dma = pltpu.make_async_copy(
            hbm.at[b, pl.ds(i * t_tile, rows), :], scr, sem)
        dma.start()
        dma.wait()

    pos0 = i * t_tile - halo
    mean = mean_ref[b][None, :]
    rs = rs_ref[b][None, :]
    xn = (x_scr[:] - mean) * rs

    # ---- forward recompute (decode _kernel_tade1's exact op order) ------
    cv = _mask_rows(c_scr[:], pos0, 0, rows, seq_len)
    a, off_a, len_a = apply_conv(cv, 0, rows, shifts9, w_aux, b_aux)
    am = _mask_rows(a, pos0, off_a, len_a, seq_len)
    cg1, off_g, len_g = apply_conv(am, off_a, len_a, shifts9, w_g1a, b_g1a)
    cg2, _, _ = apply_conv(am, off_a, len_a, shifts9, w_g1b, b_g1b)
    xn_s = lax.slice_in_dim(xn, off_g, off_g + len_g, axis=0)
    y = cg1 * xn_s + cg2
    ym = _mask_rows(y, pos0, off_g, len_g, seq_len)
    ta, off_t, len_t = apply_conv(ym, off_g, len_g, shifts9, w_c1a, b_c1a)
    tb, _, _ = apply_conv(ym, off_g, len_g, shifts9, w_c1b, b_c1b)

    # ---- reverse -------------------------------------------------------
    lo, hi = i * t_tile, (i + 1) * t_tile
    dx2v = lax.slice_in_dim(dx2_scr[:], off_t, off_t + len_t, axis=0)
    dta, dtb = _gate_vjp(ta, tb, dx2v, ones_ref, gated_function)
    conv_wgrads(ym, _owned_rows(dta, pos0, off_t, len_t, lo, hi, seq_len),
                 len_t, shifts9, dw_c1a, db_c1a)
    conv_wgrads(ym, _owned_rows(dtb, pos0, off_t, len_t, lo, hi, seq_len),
                 len_t, shifts9, dw_c1b, db_c1b)
    dym = apply_conv_t(dta, len_t, len_g, shifts9, w_c1a)
    dym = dym + apply_conv_t(dtb, len_t, len_g, shifts9, w_c1b)
    dy = _mask_rows(dym, pos0, off_g, len_g, seq_len)  # ym = mask(y)
    dcg1 = dy * xn_s
    dcg2 = dy
    dxn_f = dy * cg1
    conv_wgrads(am, _owned_rows(dcg1, pos0, off_g, len_g, lo, hi, seq_len),
                 len_g, shifts9, dw_g1a, db_g1a)
    conv_wgrads(am, _owned_rows(dcg2, pos0, off_g, len_g, lo, hi, seq_len),
                 len_g, shifts9, dw_g1b, db_g1b)
    dam = apply_conv_t(dcg1, len_g, len_a, shifts9, w_g1a)
    dam = dam + apply_conv_t(dcg2, len_g, len_a, shifts9, w_g1b)
    # a feeds g1 through the mask (am) AND is the block's c_out (raw)
    da = _mask_rows(dam, pos0, off_a, len_a, seq_len) + lax.slice_in_dim(
        da_scr[:], off_a, off_a + len_a, axis=0)
    conv_wgrads(cv, _owned_rows(da, pos0, off_a, len_a, lo, hi, seq_len),
                 len_a, shifts9, dw_aux, db_aux)
    dcv = apply_conv_t(da, len_a, rows, shifts9, w_aux)

    dxn_full = jnp.pad(dxn_f, ((off_g, rows - off_g - len_g), (0, 0)))
    dxn_out[0] = lax.slice_in_dim(
        dxn_full, halo, halo + t_tile, axis=0).astype(dxn_out.dtype)
    dc_out[0] = lax.slice_in_dim(
        dcv, halo, halo + t_tile, axis=0).astype(dc_out.dtype)


def _kernel_tade2_bwd(
    x2_hbm, a_hbm, dxo_hbm, dco_hbm, mean_ref, rs_ref, *refs,
    t_tile_in: int, halo_in: int, scale: int, shifts9: tuple,
    shifts_d: tuple, seq_out: int, gated_function: str,
    mxu_bf16: bool = False,
):
    (w_aux, b_aux, w_g2a, b_g2a, w_g2b, b_g2b, w_c2a, b_c2a, w_c2b, b_c2b,
     ones_ref,
     dxn2_out, da_out,
     dw_aux, db_aux, dw_g2a, db_g2a, dw_g2b, db_g2b,
     dw_c2a, db_c2a, dw_c2b, db_c2b,
     x2_scr, a_scr, dxo_scr, dco_scr, s0, s1, s2, s3) = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = b * pl.num_programs(1) + i

    @pl.when(step == 0)
    def _():
        for ref in (dw_aux, db_aux, dw_g2a, db_g2a, dw_g2b, db_g2b,
                    dw_c2a, db_c2a, dw_c2b, db_c2b):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    apply_conv = functools.partial(_apply_conv, mxu_bf16=mxu_bf16)
    apply_conv_t = functools.partial(_apply_conv_t,
                                     mxu_bf16=mxu_bf16)
    conv_wgrads = functools.partial(_conv_wgrads,
                                    mxu_bf16=mxu_bf16)

    rows_in = t_tile_in + 2 * halo_in
    rows = scale * rows_in
    for hbm, scr, sem, start, n in (
        (x2_hbm, x2_scr, s0, i * t_tile_in, rows_in),
        (a_hbm, a_scr, s1, i * t_tile_in, rows_in),
        (dxo_hbm, dxo_scr, s2, scale * i * t_tile_in, rows),
        (dco_hbm, dco_scr, s3, scale * i * t_tile_in, rows),
    ):
        dma = pltpu.make_async_copy(hbm.at[b, pl.ds(start, n), :], scr, sem)
        dma.start()
        dma.wait()

    pos0 = scale * (i * t_tile_in - halo_in)
    mean = mean_ref[b][None, :]
    rs = rs_ref[b][None, :]
    xn2 = (x2_scr[:] - mean) * rs

    # ---- forward recompute (decode _kernel_tade2's exact op order) ------
    up = _stretch_2d(xn2, scale)
    cu = _stretch_2d(a_scr[:], scale)
    cv = _mask_rows(cu, pos0, 0, rows, seq_out)
    a2, off_a, len_a = apply_conv(cv, 0, rows, shifts9, w_aux, b_aux)
    am = _mask_rows(a2, pos0, off_a, len_a, seq_out)
    cg1, off_g, len_g = apply_conv(am, off_a, len_a, shifts9, w_g2a, b_g2a)
    cg2, _, _ = apply_conv(am, off_a, len_a, shifts9, w_g2b, b_g2b)
    up_s = lax.slice_in_dim(up, off_g, off_g + len_g, axis=0)
    y = cg1 * up_s + cg2
    ym = _mask_rows(y, pos0, off_g, len_g, seq_out)
    ta, off_t, len_t = apply_conv(ym, off_g, len_g, shifts_d, w_c2a, b_c2a)
    tb, _, _ = apply_conv(ym, off_g, len_g, shifts_d, w_c2b, b_c2b)

    # ---- reverse -------------------------------------------------------
    lo, hi = scale * i * t_tile_in, scale * (i + 1) * t_tile_in
    dxov = lax.slice_in_dim(dxo_scr[:], off_t, off_t + len_t, axis=0)
    dta, dtb = _gate_vjp(ta, tb, dxov, ones_ref, gated_function)
    conv_wgrads(ym, _owned_rows(dta, pos0, off_t, len_t, lo, hi, seq_out),
                 len_t, shifts_d, dw_c2a, db_c2a)
    conv_wgrads(ym, _owned_rows(dtb, pos0, off_t, len_t, lo, hi, seq_out),
                 len_t, shifts_d, dw_c2b, db_c2b)
    dym = apply_conv_t(dta, len_t, len_g, shifts_d, w_c2a)
    dym = dym + apply_conv_t(dtb, len_t, len_g, shifts_d, w_c2b)
    dy = _mask_rows(dym, pos0, off_g, len_g, seq_out)
    dcg1 = dy * up_s
    dcg2 = dy
    dup_s = dy * cg1
    conv_wgrads(am, _owned_rows(dcg1, pos0, off_g, len_g, lo, hi, seq_out),
                 len_g, shifts9, dw_g2a, db_g2a)
    conv_wgrads(am, _owned_rows(dcg2, pos0, off_g, len_g, lo, hi, seq_out),
                 len_g, shifts9, dw_g2b, db_g2b)
    dam = apply_conv_t(dcg1, len_g, len_a, shifts9, w_g2a)
    dam = dam + apply_conv_t(dcg2, len_g, len_a, shifts9, w_g2b)
    da2 = _mask_rows(dam, pos0, off_a, len_a, seq_out) + lax.slice_in_dim(
        dco_scr[:], off_a, off_a + len_a, axis=0)
    conv_wgrads(cv, _owned_rows(da2, pos0, off_a, len_a, lo, hi, seq_out),
                 len_a, shifts9, dw_aux, db_aux)
    dcv = apply_conv_t(da2, len_a, rows, shifts9, w_aux)

    # emit OUTPUT-rate grads; the nearest-x2 stretch transpose (a lane
    # slice + concat Mosaic cannot re-tile in-kernel) runs on the host as
    # ``_stretch_t_packed`` over the full packed array.
    dup_full = jnp.pad(dup_s, ((off_g, rows - off_g - len_g), (0, 0)))
    halo_out = scale * halo_in
    t_tile_out = scale * t_tile_in
    dxn2_out[0] = lax.slice_in_dim(
        dup_full, halo_out, halo_out + t_tile_out, axis=0
    ).astype(dxn2_out.dtype)
    da_out[0] = lax.slice_in_dim(
        dcv, halo_out, halo_out + t_tile_out, axis=0).astype(da_out.dtype)


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def _vmem_specs(ws):
    return [
        pl.BlockSpec(w.shape, (lambda bb, ii, nd=w.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for w in ws
    ]


def _wgrad_outs(shift_sets):
    """(specs, shapes) for 5 convs' packed dW (n_shifts,128,128) + db."""
    specs, shapes = [], []
    for shifts in shift_sets:
        n = len(shifts)
        specs.append(pl.BlockSpec((n, LANES, LANES),
                                  lambda bb, ii: (0, 0, 0),
                                  memory_space=pltpu.VMEM))
        shapes.append(jax.ShapeDtypeStruct((n, LANES, LANES), jnp.float32))
        specs.append(pl.BlockSpec((1, LANES), lambda bb, ii: (0, 0),
                                  memory_space=pltpu.VMEM))
        shapes.append(jax.ShapeDtypeStruct((1, LANES), jnp.float32))
    return specs, shapes


def _run_tade1_bwd(xp, cp, dx2p, dap, mean, rs, w, *, t, t_tile,
                   gated_function, interpret, mxu_bf16=False):
    b, rows_tot, _ = xp.shape
    # bf16-resident: activations/cotangents stay bf16 in HBM + VMEM
    # scratch; weight-grad accumulators and stats stay f32 (KERNELS.md
    # round-5 section). halo=16 is already a bf16 sublane multiple.
    io_dtype = xp.dtype
    granule = 16 if io_dtype == jnp.bfloat16 else 8
    halo = 16
    shifts9, w_aux, b_aux = _stacked(w["aux1_w"], w["aux1_b"], 1)
    (w1a, b1a), (w1b, b1b) = _split_gate_weights(w["g1_w"], w["g1_b"])
    _, wg1a, bg1a = _stacked(w1a, b1a, 1)
    _, wg1b, bg1b = _stacked(w1b, b1b, 1)
    (wc1a_, bc1a_), (wc1b_, bc1b_) = _split_gate_weights(
        w["gc1_w"], w["gc1_b"])
    _, wc1a, bc1a = _stacked(wc1a_, bc1a_, 1)
    _, wc1b, bc1b = _stacked(wc1b_, bc1b_, 1)
    ones = _group_ones()

    tile = min(t_tile, _round_up(rows_tot, granule))
    n_tiles = -(-rows_tot // tile)
    t_rows = n_tiles * tile

    def prep(v):
        return _pad_halo(
            jnp.pad(v, ((0, 0), (0, t_rows - rows_tot), (0, 0))), halo)

    ws = [w_aux, b_aux, wg1a, bg1a, wg1b, bg1b, wc1a, bc1a, wc1b, bc1b,
          ones]
    kernel = functools.partial(
        _kernel_tade1_bwd, t_tile=tile, halo=halo, shifts9=shifts9,
        seq_len=t, gated_function=gated_function, mxu_bf16=mxu_bf16,
    )
    rows = tile + 2 * halo
    wg_specs, wg_shapes = _wgrad_outs([shifts9] * 5)
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY)] * 4
            + [pl.BlockSpec(mean.shape, lambda bb, ii: (0, 0),
                            memory_space=pltpu.VMEM)] * 2
            + _vmem_specs(ws)
        ),
        out_specs=[
            pl.BlockSpec((1, tile, LANES), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, LANES), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
        ] + wg_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, t_rows, LANES), io_dtype),
            jax.ShapeDtypeStruct((b, t_rows, LANES), io_dtype),
        ] + wg_shapes,
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(prep(xp), prep(cp), prep(dx2p), prep(dap), mean, rs, *ws)

    (dxn, dc, m_aux, v_aux, m_g1a, v_g1a, m_g1b, v_g1b,
     m_c1a, v_c1a, m_c1b, v_c1b) = outs
    dw = {}
    dw["aux1_w"], dw["aux1_b"] = _unpack_wgrad(m_aux, v_aux, 9, 1)
    dwa, dba = _unpack_wgrad(m_g1a, v_g1a, 9, 1)
    dwb, dbb = _unpack_wgrad(m_g1b, v_g1b, 9, 1)
    dw["g1_w"] = jnp.concatenate([dwa, dwb], axis=-1)
    dw["g1_b"] = jnp.concatenate([dba, dbb])
    dwa, dba = _unpack_wgrad(m_c1a, v_c1a, 9, 1)
    dwb, dbb = _unpack_wgrad(m_c1b, v_c1b, 9, 1)
    dw["gc1_w"] = jnp.concatenate([dwa, dwb], axis=-1)
    dw["gc1_b"] = jnp.concatenate([dba, dbb])
    return dxn[:, :rows_tot], dc[:, :rows_tot], dw


def _run_tade2_bwd(x2p, ap, dxop, dcop, mean, rs, w, scale, dilation, *,
                   t, t_tile, gated_function, interpret,
                   mxu_bf16=False):
    b, rows_in_tot, _ = x2p.shape
    io_dtype = x2p.dtype
    granule = 16 if io_dtype == jnp.bfloat16 else 8
    halo_out_needed = 2 * (2 + 2 + 2 * dilation)
    halo_in = _round_up(-(-halo_out_needed // scale), granule)
    shifts9 = tuple(sorted(_conv_shift_table(9, 1, P)))
    _, w_aux, b_aux = _stacked(w["aux2_w"], w["aux2_b"], 1)
    (w2a, b2a), (w2b, b2b) = _split_gate_weights(w["g2_w"], w["g2_b"])
    _, wg2a, bg2a = _stacked(w2a, b2a, 1)
    _, wg2b, bg2b = _stacked(w2b, b2b, 1)
    (wc2a_, bc2a_), (wc2b_, bc2b_) = _split_gate_weights(
        w["gc2_w"], w["gc2_b"])
    shifts_d, wc2a, bc2a = _stacked(wc2a_, bc2a_, dilation)
    _, wc2b, bc2b = _stacked(wc2b_, bc2b_, dilation)
    ones = _group_ones()

    tile_in = min(t_tile, _round_up(rows_in_tot, granule))
    n_tiles = -(-rows_in_tot // tile_in)
    t_rows_in = n_tiles * tile_in

    def prep_in(v):
        return _pad_halo(
            jnp.pad(v, ((0, 0), (0, t_rows_in - rows_in_tot), (0, 0))),
            halo_in)

    def prep_out(v):
        rows_out_tot = v.shape[1]
        return _pad_halo(
            jnp.pad(v, ((0, 0),
                        (0, scale * t_rows_in - rows_out_tot), (0, 0))),
            scale * halo_in)

    ws = [w_aux, b_aux, wg2a, bg2a, wg2b, bg2b, wc2a, bc2a, wc2b, bc2b,
          ones]
    kernel = functools.partial(
        _kernel_tade2_bwd, t_tile_in=tile_in, halo_in=halo_in, scale=scale,
        shifts9=shifts9, shifts_d=shifts_d, seq_out=t * scale,
        gated_function=gated_function, mxu_bf16=mxu_bf16,
    )
    rows_in = tile_in + 2 * halo_in
    rows = scale * rows_in
    wg_specs, wg_shapes = _wgrad_outs(
        [shifts9, shifts9, shifts9, shifts_d, shifts_d])
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY)] * 4
            + [pl.BlockSpec(mean.shape, lambda bb, ii: (0, 0),
                            memory_space=pltpu.VMEM)] * 2
            + _vmem_specs(ws)
        ),
        out_specs=[
            pl.BlockSpec((1, scale * tile_in, LANES),
                         lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, scale * tile_in, LANES),
                         lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
        ] + wg_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, scale * t_rows_in, LANES), io_dtype),
            jax.ShapeDtypeStruct((b, scale * t_rows_in, LANES), io_dtype),
        ] + wg_shapes,
        scratch_shapes=[
            pltpu.VMEM((rows_in, LANES), io_dtype),
            pltpu.VMEM((rows_in, LANES), io_dtype),
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.VMEM((rows, LANES), io_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(prep_in(x2p), prep_in(ap), prep_out(dxop), prep_out(dcop),
      mean, rs, *ws)

    (dup, dco_a, m_aux, v_aux, m_g2a, v_g2a, m_g2b, v_g2b,
     m_c2a, v_c2a, m_c2b, v_c2b) = outs
    rows_out_tot = scale * rows_in_tot
    dxn2 = _stretch_t_packed(dup[:, :rows_out_tot], scale)
    da = _stretch_t_packed(dco_a[:, :rows_out_tot], scale)
    dw = {}
    dw["aux2_w"], dw["aux2_b"] = _unpack_wgrad(m_aux, v_aux, 9, 1)
    dwa, dba = _unpack_wgrad(m_g2a, v_g2a, 9, 1)
    dwb, dbb = _unpack_wgrad(m_g2b, v_g2b, 9, 1)
    dw["g2_w"] = jnp.concatenate([dwa, dwb], axis=-1)
    dw["g2_b"] = jnp.concatenate([dba, dbb])
    dwa, dba = _unpack_wgrad(m_c2a, v_c2a, 9, dilation)
    dwb, dbb = _unpack_wgrad(m_c2b, v_c2b, 9, dilation)
    dw["gc2_w"] = jnp.concatenate([dwa, dwb], axis=-1)
    dw["gc2_b"] = jnp.concatenate([dba, dbb])
    return dxn2[:, :rows_in_tot], da[:, :rows_in_tot], dw


# ---------------------------------------------------------------------------
# custom_vjp block + chain runner
# ---------------------------------------------------------------------------


def _block_fwd_impl(x, c, w, scale, dilation, gated_function, t_tile,
                    interpret, mxu_bf16):
    t = x.shape[1]
    rows = t // P
    wf = {k: w[k].astype(jnp.float32) for k in _WEIGHT_KEYS}
    # bf16-resident (round 5): under mixed precision the packed
    # activation stream — forward, residuals for the backward's
    # recompute, and the reverse cotangents — stays bfloat16 in HBM and
    # VMEM; only stats and weight-grad accumulators are f32. This halves
    # the traffic that r4 measured as the bf16-regime limiter.
    io_dtype = (jnp.bfloat16 if mxu_bf16 and x.dtype == jnp.bfloat16
                else jnp.float32)
    xp = _pack_time(x.astype(io_dtype), rows)
    cp = _pack_time(c.astype(io_dtype), rows)
    blk = dict(wf)
    blk["scale"], blk["dilation"] = scale, dilation
    x2p, ap = _run_tade1(xp, cp, t, blk, t_tile=t_tile,
                         gated_function=gated_function, interpret=interpret,
                         mxu_bf16=mxu_bf16)
    x3p, c3p = _run_tade2(x2p, ap, xp, t, blk, t_tile=t_tile,
                          gated_function=gated_function, interpret=interpret,
                          mxu_bf16=mxu_bf16)
    x_out = _unpack_time(x3p, t * scale, C0P).astype(x.dtype)
    c_out = _unpack_time(c3p, t * scale, C0P).astype(c.dtype)
    return (x_out, c_out), (xp, cp, x2p, ap, dict(w),
                            jnp.zeros((0,), x.dtype), jnp.zeros((0,), c.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def tade_block_train(x, c, w, scale, dilation, gated_function="softmax",
                     t_tile=512, interpret=False, mxu_bf16=False):
    """Differentiable fused TADEResBlock: (x, c, w) -> (x_out, c_out)."""
    return _block_fwd_impl(
        x, c, w, scale, dilation, gated_function, t_tile, interpret,
        mxu_bf16)[0]


def _block_fwd(x, c, w, scale, dilation, gated_function, t_tile, interpret,
               mxu_bf16):
    return _block_fwd_impl(
        x, c, w, scale, dilation, gated_function, t_tile, interpret,
        mxu_bf16)


def _block_bwd(scale, dilation, gated_function, t_tile, interpret, mxu_bf16,
               res, grads):
    xp, cp, x2p, ap, worig, xmark, cmark = res
    wf = {k: worig[k].astype(jnp.float32) for k in _WEIGHT_KEYS}
    dxo, dco = grads
    interpret = interpret or jax.default_backend() != "tpu"
    t = xp.shape[1] * P
    rows_out = t * scale // P
    io_dtype = xp.dtype  # bf16-resident cotangents under mixed precision
    dxop = _pack_time(dxo.astype(io_dtype), rows_out)
    dcop = _pack_time(dco.astype(io_dtype), rows_out)
    mean2, rs2 = _packed_stats(x2p, t)
    mean1, rs1 = _packed_stats(xp, t)

    dxn2p, dap, dw2 = _run_tade2_bwd(
        x2p, ap, dxop, dcop, mean2, rs2, wf, scale, dilation, t=t,
        t_tile=t_tile, gated_function=gated_function, interpret=interpret,
        mxu_bf16=mxu_bf16)
    dx2p = _in_bwd_packed(dxn2p, x2p, mean2, rs2, t)
    dxn1p, dcp, dw1 = _run_tade1_bwd(
        xp, cp, dx2p, dap, mean1, rs1, wf, t=t, t_tile=t_tile,
        gated_function=gated_function, interpret=interpret,
        mxu_bf16=mxu_bf16)
    dxp = _in_bwd_packed(dxn1p, xp, mean1, rs1, t) + _stretch_t_packed(
        dxop, scale)
    dx = _unpack_time(dxp, t, C0P).astype(xmark.dtype)
    dc = _unpack_time(dcp[:, :t // P], t, C0P).astype(cmark.dtype)
    dw = {**dw1, **dw2}
    dw = {k: dw[k].astype(worig[k].dtype) for k in _WEIGHT_KEYS}
    return dx, dc, dw


tade_block_train.defvjp(_block_fwd, _block_bwd)


def fused_tade_blocks_train(
    x, c, blocks, *, gated_function: str = "softmax",
    min_fused_t: int = 1024, t_tile: int = 512, interpret: bool = False,
):
    """Differentiable TADE-block chain; long 64-ch blocks run fused.

    Same interface as ``tade_decode.fused_tade_blocks`` but training-
    capable: each eligible block is a ``custom_vjp`` whose backward runs
    the fused reverse kernels; ineligible blocks (the 80-ch mel-fed first
    block, short lengths, odd lengths, scales other than 1/2) fall back
    to the differentiable XLA twin.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    for blk in blocks:
        t = x.shape[1]
        scale = int(blk["scale"])
        use_kernel = (
            t >= min_fused_t
            and blk["aux1_w"].shape[1] == C0P
            and t % P == 0
            and scale in (1, 2)
        )
        if use_kernel:
            w = {k: blk[k] for k in _WEIGHT_KEYS}
            # bf16 activations (mixed_precision: true) -> bf16 MXU
            # operands inside the kernels, matching XLA's matmul
            # precision in that mode; f32 activations keep f32 MXU.
            mxu_bf16 = x.dtype == jnp.bfloat16
            x, c = tade_block_train(
                x, c, w, scale, int(blk["dilation"]), gated_function,
                t_tile, bool(interpret), mxu_bf16)
        else:
            x, c = tade_block_xla(x, c, blk, gated_function=gated_function)
    return x, c
