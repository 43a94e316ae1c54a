"""Training-capable fused WaveNet cycle: custom_vjp over the stack kernel.

Forward: the whole-cycle inference kernel (ops/pallas_kernels/
wavenet_stack.py) — one pallas call per dilation cycle, residual stream
and conditioning resident in VMEM.

Backward: a second fused kernel that, per (batch, tile) grid step,
RECOMPUTES the forward inside the halo'd tile (storing every layer's
residual input x_l and pre-activation z_l in VMEM) and then walks the
layers in reverse producing dx, dc and all weight gradients in the same
call. The XLA autodiff path materializes ~8 HBM-bound ops per layer
(measured 48 ms for the 30-layer PWG v1 backward at batch 6 x 25600);
here the whole reverse cycle runs out of VMEM.

Halo correctness: the forward-recompute margin (sum of pads below layer
l) and the reverse conv-transpose margin (sum of pads at and above l) add
to exactly the fwd halo H at every layer, so center-tile dx/dc are exact.
Weight-gradient contractions mask rows to the tile-owned in-sequence
range so grid steps contribute disjoint partial sums, accumulated into
revisited output blocks (the TPU grid is sequential — race-free).

Behavioral reference for the layer math:
/root/reference/parallel_wavegan/layers/residual_block.py:102-140.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallelwavegan_tpu.ops.pallas_kernels.wavenet_stack import (
    _round_up,
    fused_wavenet_stack,
)

SQRT_HALF = math.sqrt(0.5)


def _offsets(dilations, n_taps, rows):
    """Static per-layer (offset, length, pad) of the sliced frame."""
    off, length = 0, rows
    out = []
    for d in dilations:
        pad = (n_taps - 1) * int(d)
        out.append((off, length, pad))
        off += pad // 2
        length -= pad
    return out, off, length  # final (frames, off_L, len_L)


def _bwd_body(
    xv, cv, dxo, dsk,
    wconv_ref, bconv_ref, waux_ref, wskip_ref, wres_ref, bres_ref,
    dx_out, dc_out,
    dwc_out, dbc_out, dwa_out, dws_out, dbs_out, dwr_out, dbr_out,
    *, t_tile: int, halo: int, dilations: tuple, n_taps: int, seq_len: int,
):
    """Reverse cycle over one halo'd tile; xv/cv/dxo/dsk are 2-D values."""
    i = pl.program_id(1)
    rows = t_tile + 2 * halo
    pos0 = i * t_tile - halo
    half = wconv_ref.shape[-1] // 2
    c_r = wconv_ref.shape[-2]

    frames, off_fin, len_fin = _offsets(dilations, n_taps, rows)
    n_layers = len(dilations)

    def valid_mask(off, length):
        gpos = pos0 + off + lax.broadcasted_iota(jnp.int32, (length, 1), 0)
        return ((gpos >= 0) & (gpos < seq_len)).astype(jnp.float32)

    def owned_mask(off, length):
        gpos = pos0 + off + lax.broadcasted_iota(jnp.int32, (length, 1), 0)
        ok = (
            (gpos >= i * t_tile)
            & (gpos < (i + 1) * t_tile)
            & (gpos < seq_len)
        )
        return ok.astype(jnp.float32)

    # ---- forward recompute, storing x_l (post-mask) and z_l ------------
    xs, zs = [], []
    for l, d in enumerate(dilations):
        off, length, pad = frames[l]
        if l > 0:
            xv = xv * valid_mask(off, length)
        xs.append(xv)
        new_len = length - pad
        new_off = off + pad // 2
        z = jnp.dot(
            lax.slice_in_dim(xv, 0, new_len, axis=0), wconv_ref[l, 0],
            preferred_element_type=jnp.float32,
        )
        for kk in range(1, n_taps):
            z = z + jnp.dot(
                lax.slice_in_dim(xv, kk * d, kk * d + new_len, axis=0),
                wconv_ref[l, kk], preferred_element_type=jnp.float32,
            )
        z = z + bconv_ref[l][None, :]
        z = z + jnp.dot(
            lax.slice_in_dim(cv, new_off, new_off + new_len, axis=0),
            waux_ref[l], preferred_element_type=jnp.float32,
        )
        zs.append(z)
        g = jnp.tanh(z[:, :half]) * jax.nn.sigmoid(z[:, half:])
        r = jnp.dot(g, wres_ref[l], preferred_element_type=jnp.float32)
        r = r + bres_ref[l][None, :]
        x_prev_c = lax.slice_in_dim(xv, pad // 2, pad // 2 + new_len, axis=0)
        xv = (r + x_prev_c) * SQRT_HALF

    # ---- reverse sweep -------------------------------------------------
    dxv = lax.slice_in_dim(dxo, off_fin, off_fin + len_fin, axis=0)
    dc_acc = jnp.zeros_like(cv)

    for l in reversed(range(n_layers)):
        d = int(dilations[l])
        off, length, pad = frames[l]
        new_len = length - pad
        new_off = off + pad // 2
        z = zs[l]
        a = jnp.tanh(z[:, :half])
        s = jax.nn.sigmoid(z[:, half:])
        g = a * s
        dS_l = lax.slice_in_dim(dsk, new_off, new_off + new_len, axis=0)
        dxn = dxv * SQRT_HALF
        dg = jnp.dot(dxn, wres_ref[l].T, preferred_element_type=jnp.float32)
        dg = dg + jnp.dot(dS_l, wskip_ref[l].T,
                          preferred_element_type=jnp.float32)
        dza = dg * s * (1.0 - a * a)
        dzb = dg * a * s * (1.0 - s)
        dz = jnp.concatenate([dza, dzb], axis=-1)

        own = owned_mask(new_off, new_len)
        dz_own = dz * own
        x_l = xs[l]

        # weight grads (disjoint per tile; accumulated across grid steps)
        for kk in range(n_taps):
            dwc_out[l, kk] += jnp.dot(
                lax.slice_in_dim(x_l, kk * d, kk * d + new_len, axis=0).T,
                dz_own, preferred_element_type=jnp.float32,
            )
        dbc_out[l] += jnp.sum(dz_own, axis=0)
        dwa_out[l] += jnp.dot(
            lax.slice_in_dim(cv, new_off, new_off + new_len, axis=0).T,
            dz_own, preferred_element_type=jnp.float32,
        )
        dS_own = dS_l * own
        dxn_own = dxn * own
        dws_out[l] += jnp.dot(g.T, dS_own, preferred_element_type=jnp.float32)
        dbs_out[l] += jnp.sum(dS_own, axis=0)
        dwr_out[l] += jnp.dot(g.T, dxn_own,
                              preferred_element_type=jnp.float32)
        dbr_out[l] += jnp.sum(dxn_own, axis=0)

        # dc (per-position, summed over layers); static pad-and-add — the
        # .at[slice].add form lowers to scatter-add, unsupported in Mosaic
        dca = jnp.dot(dz, waux_ref[l].T, preferred_element_type=jnp.float32)
        rows_total = dc_acc.shape[0]
        dc_acc = dc_acc + jnp.pad(
            dca, ((new_off, rows_total - new_off - new_len), (0, 0))
        )

        # dx_l: transposed dilated conv + residual passthrough
        def place(v, lo):
            return jnp.pad(v, ((lo, length - lo - new_len), (0, 0)))

        dx_new = place(dxn, pad // 2)
        for kk in range(n_taps):
            contrib = jnp.dot(dz, wconv_ref[l, kk].T,
                              preferred_element_type=jnp.float32)
            dx_new = dx_new + place(contrib, kk * d)
        if l > 0:
            dx_new = dx_new * valid_mask(off, length)
        dxv = dx_new

    dx_out[0] = lax.slice_in_dim(dxv, halo, halo + t_tile, axis=0)
    dc_out[0] = lax.slice_in_dim(dc_acc, halo, halo + t_tile, axis=0)


def _stack_bwd_pallas(x, c, weights, dilations, dxo, dsk, *,
                      t_tile: int, interpret: bool):
    """(dx, dc, dweights) for one fused cycle via the reverse kernel."""
    b, t, c_r0 = x.shape
    n_taps = weights["wconv"].shape[1]
    c_g = weights["wconv"].shape[-1]
    c_s0 = weights["wskip"].shape[-1]
    c_a0 = c.shape[-1]
    c_h = weights["wskip"].shape[-2]
    n_layers = weights["wconv"].shape[0]
    # the reverse pass needs TWICE the forward halo: Σpad/2 per side for
    # the activation recompute PLUS Σpad/2 per side for conv-transpose
    # spill-ins from neighbor tiles (found empirically: with the fwd halo,
    # owned-edge dz rows at intermediate layers miss left-neighbor
    # contributions and every weight-grad sum drifts ~1e-3)
    halo = _round_up(sum((n_taps - 1) * int(d) for d in dilations), 8)

    def pad_last(a, target):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, target - a.shape[-1])])

    def pad_axis(a, axis, target):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, target - a.shape[axis])
        return jnp.pad(a, pads)

    c_r = _round_up(c_r0, 128)
    c_s = _round_up(c_s0, 128)
    c_a = _round_up(c_a0, 128)

    t_tile = min(t_tile, _round_up(t, 8))
    n_tiles = -(-t // t_tile)
    t_padded = n_tiles * t_tile
    rows = t_tile + 2 * halo

    def pad_seq(a, lanes):
        return jnp.pad(
            pad_last(a.astype(jnp.float32), lanes),
            ((0, 0), (halo, halo + t_padded - t), (0, 0)),
        )

    xp = pad_seq(x, c_r)
    cp = pad_seq(c, c_a)
    dxop = pad_seq(dxo, c_r)
    dskp = pad_seq(dsk, c_s)

    w = {
        "wconv": pad_axis(weights["wconv"], 2, c_r).astype(jnp.float32),
        "bconv": weights["bconv"].astype(jnp.float32),
        "waux": pad_axis(weights["waux"], 1, c_a).astype(jnp.float32),
        "wskip": pad_last(weights["wskip"], c_s).astype(jnp.float32),
        "wres": pad_last(weights["wres"], c_r).astype(jnp.float32),
        "bres": pad_last(weights["bres"], c_r).astype(jnp.float32),
    }

    def kernel(xh, ch, dxoh, dskh, wconv, bconv, waux, wskip, wres, bres,
               dx_o, dc_o, dwc_o, dbc_o, dwa_o, dws_o, dbs_o, dwr_o, dbr_o,
               xs_s, cs_s, dxs_s, dss_s, sx, sc, sdx, sds):
        bq = pl.program_id(0)
        iq = pl.program_id(1)
        step = bq * pl.num_programs(1) + iq

        @pl.when(step == 0)
        def _():
            for ref in (dwc_o, dbc_o, dwa_o, dws_o, dbs_o, dwr_o, dbr_o):
                ref[...] = jnp.zeros(ref.shape, ref.dtype)

        for ref, scr, sem in ((xh, xs_s, sx), (ch, cs_s, sc),
                              (dxoh, dxs_s, sdx), (dskh, dss_s, sds)):
            dma = pltpu.make_async_copy(
                ref.at[bq, pl.ds(iq * t_tile, rows), :], scr, sem
            )
            dma.start()
            dma.wait()
        _bwd_body(
            xs_s[...], cs_s[...], dxs_s[...], dss_s[...],
            wconv, bconv, waux, wskip, wres, bres,
            dx_o, dc_o, dwc_o, dbc_o, dwa_o, dws_o, dbs_o, dwr_o, dbr_o,
            t_tile=t_tile, halo=halo,
            dilations=tuple(int(d) for d in dilations), n_taps=n_taps,
            seq_len=t,
        )

    full = lambda *s: pl.BlockSpec(  # noqa: E731
        s, lambda bb, ii, n=len(s): (0,) * n, memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4 + [
            full(n_layers, n_taps, c_r, c_g),
            full(n_layers, c_g),
            full(n_layers, c_a, c_g),
            full(n_layers, c_h, c_s),
            full(n_layers, c_h, c_r),
            full(n_layers, c_r),
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile, c_r), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, c_a), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            full(n_layers, n_taps, c_r, c_g),
            full(n_layers, c_g),
            full(n_layers, c_a, c_g),
            full(n_layers, c_h, c_s),
            full(n_layers, c_s),
            full(n_layers, c_h, c_r),
            full(n_layers, c_r),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_padded, c_r), jnp.float32),
            jax.ShapeDtypeStruct((b, t_padded, c_a), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, n_taps, c_r, c_g), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c_g), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c_a, c_g), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c_h, c_s), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c_s), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c_h, c_r), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c_r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, c_r), jnp.float32),
            pltpu.VMEM((rows, c_a), jnp.float32),
            pltpu.VMEM((rows, c_r), jnp.float32),
            pltpu.VMEM((rows, c_s), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, cp, dxop, dskp, w["wconv"], w["bconv"], w["waux"], w["wskip"],
      w["wres"], w["bres"])

    dx_o, dc_o, dwc, dbc, dwa, dws, dbs, dwr, dbr = outs
    dweights = {
        "wconv": dwc[:, :, :c_r0, :],
        "bconv": dbc,
        "waux": dwa[:, :c_a0, :],
        "wskip": dws[:, :, :c_s0],
        "bskip": dbs[:, :c_s0],
        "wres": dwr[:, :, :c_r0],
        "bres": dbr[:, :c_r0],
    }
    return dx_o[:, :t, :c_r0], dc_o[:, :t, :c_a0], dweights


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def wavenet_stack_train(x, c, weights, dilations, t_tile=4096,
                        interpret=False):
    """Differentiable fused cycle: (x, c, weights) -> (x_out, skip_sum)."""
    return fused_wavenet_stack(
        x, c, weights, dilations, t_tile=t_tile, interpret=interpret
    )


def _train_fwd(x, c, weights, dilations, t_tile, interpret):
    out = fused_wavenet_stack(
        x, c, weights, dilations, t_tile=t_tile, interpret=interpret
    )
    return out, (x, c, weights)


def _train_bwd(dilations, t_tile, interpret, res, grads):
    x, c, weights = res
    dxo, dsk = grads
    interpret = interpret or jax.default_backend() != "tpu"
    dx, dc, dw = _stack_bwd_pallas(
        x, c, weights, dilations, dxo, dsk, t_tile=t_tile,
        interpret=interpret,
    )
    dw = {k: v.astype(weights[k].dtype) for k, v in dw.items()}
    return dx.astype(x.dtype), dc.astype(c.dtype), dw


wavenet_stack_train.defvjp(_train_fwd, _train_bwd)


def fused_wavenet_cycle_train(
    x, c, weights, dilations, *, t_tile: int = 4096,
    max_layers_per_call: int = 10, interpret: bool = False,
):
    """Differentiable chunked cycle runner (mirrors fused_wavenet_cycle).

    Chunk-boundary residual streams are materialized in HBM between calls,
    so each chunk's custom_vjp saves exactly its own (x, c, weights) —
    classic cycle-level checkpointing.
    """
    skips = None
    for s in range(0, len(dilations), max_layers_per_call):
        e = min(s + max_layers_per_call, len(dilations))
        chunk = {k: v[s:e] for k, v in weights.items()}
        x, sk = wavenet_stack_train(
            x, c, chunk, tuple(int(d) for d in dilations[s:e]), t_tile,
            interpret,
        )
        skips = sk if skips is None else skips + sk
    return x, skips
