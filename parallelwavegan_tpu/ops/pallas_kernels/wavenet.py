"""Fused WaveNet gated residual block as one Pallas TPU kernel.

Fuses the whole hot block of the Parallel WaveGAN generator
(/root/reference/parallel_wavegan/layers/residual_block.py:102-140):

    z   = dilated_conv(x) + 1x1_aux(c)        # (T, gate)
    g   = tanh(z_a) * sigmoid(z_b)            # gated activation
    s   = g @ W_skip + b_skip                 # skip head
    r   = (g @ W_res + b_res + x) * sqrt(1/2) # residual head

into a single kernel: one HBM read of x (with dilation halo, DMA'd
manually), one of c, and direct writes of (r, s) — the (T, gate)
intermediate never touches HBM. The dilated K-tap conv is computed as K
shifted (T, C_r) @ (C_r, C_g) matmuls on the MXU.

Gradients: `fused_gated_resblock` is a jax.custom_vjp whose backward pass
re-derives the block with the pure-XLA twin (`gated_resblock_xla`) —
rematerialization trades one extra forward for zero saved intermediates.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_HALF = math.sqrt(0.5)


# ---------------------------------------------------------------------------
# XLA reference implementation (also the backward-pass twin)
# ---------------------------------------------------------------------------


def gated_resblock_xla(
    x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel, skip_bias,
    res_kernel, res_bias, *, dilation: int, causal: bool,
):
    """Pure-XLA gated residual block.

    Args:
        x: (B, T, C_r) residual stream.
        c: (B, T, C_a) conditioning (or None).
        conv_kernel: (K, C_r, C_g) dilated conv kernel (gather form).
        aux_kernel: (C_a, C_g) 1x1 conditioning projection (or None).
        skip_kernel/res_kernel: (C_g // 2, C_s) / (C_g // 2, C_r).

    Returns:
        (residual_out (B, T, C_r), skip_out (B, T, C_s))
    """
    k = conv_kernel.shape[0]
    pad = (k - 1) * dilation
    padding = (pad, 0) if causal else (pad // 2, pad - pad // 2)
    z = lax.conv_general_dilated(
        x,
        conv_kernel,
        window_strides=(1,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    if conv_bias is not None:
        z = z + conv_bias
    if c is not None and aux_kernel is not None:
        z = z + c @ aux_kernel
    half = z.shape[-1] // 2
    g = jnp.tanh(z[..., :half]) * jax.nn.sigmoid(z[..., half:])
    s = g @ skip_kernel
    if skip_bias is not None:
        s = s + skip_bias
    r = g @ res_kernel
    if res_bias is not None:
        r = r + res_bias
    return (r + x) * SQRT_HALF, s


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(
    xp_hbm,  # (B, T + pad, C_r) in ANY/HBM, pre-padded along time
    c_ref,  # (1, T_TILE, C_a) VMEM
    wconv_ref,  # (K, C_r, C_g) VMEM
    bconv_ref,  # (1, C_g)
    waux_ref,  # (C_a, C_g)
    wskip_ref,  # (C_h, C_s)
    bskip_ref,  # (1, C_s)
    wres_ref,  # (C_h, C_r)
    bres_ref,  # (1, C_r)
    res_out,  # (1, T_TILE, C_r)
    skip_out,  # (1, T_TILE, C_s)
    x_scratch,  # (T_TILE + pad, C_r) VMEM
    sem,
    *,
    t_tile: int,
    dilation: int,
    n_taps: int,
    center_off: int,
    halo_rows: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(i * t_tile, halo_rows), :], x_scratch, sem
    )
    dma.start()
    dma.wait()

    z = jnp.dot(
        x_scratch[0:t_tile, :], wconv_ref[0], preferred_element_type=jnp.float32
    )
    for kk in range(1, n_taps):
        z = z + jnp.dot(
            x_scratch[kk * dilation : kk * dilation + t_tile, :],
            wconv_ref[kk],
            preferred_element_type=jnp.float32,
        )
    z = z + bconv_ref[0][None, :]
    z = z + jnp.dot(c_ref[0], waux_ref[:], preferred_element_type=jnp.float32)

    half = z.shape[-1] // 2
    g = jnp.tanh(z[:, :half]) * jax.nn.sigmoid(z[:, half:])

    s = (
        jnp.dot(g, wskip_ref[:], preferred_element_type=jnp.float32)
        + bskip_ref[0][None, :]
    )
    x_center = x_scratch[center_off : center_off + t_tile, :]
    r = (
        jnp.dot(g, wres_ref[:], preferred_element_type=jnp.float32)
        + bres_ref[0][None, :]
        + x_center
    ) * SQRT_HALF
    res_out[0] = r
    skip_out[0] = s


def _round_up(n: int, m: int = 128) -> int:
    return -(-n // m) * m


def _pad_last(a, target: int):
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, target - a.shape[-1])])


def _pad_axis(a, axis: int, target: int):
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, target - a.shape[axis])
    return jnp.pad(a, pads)


def _pallas_forward(
    x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel, skip_bias,
    res_kernel, res_bias, dilation: int, causal: bool, t_tile: int,
    interpret: bool,
):
    interpret = interpret or jax.default_backend() != "tpu"
    b, t, c_r0 = x.shape
    k = conv_kernel.shape[0]
    if not interpret:
        # Mosaic requires sublane-aligned (x8) in-VMEM row slices: the tap
        # offsets are multiples of the dilation, so small dilations take
        # the XLA path (they are the cheap fused-anyway layers).
        pad_ = (k - 1) * dilation
        center = pad_ if causal else pad_ // 2
        if dilation % 8 != 0 or center % 8 != 0:
            return gated_resblock_xla(
                x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel,
                skip_bias, res_kernel, res_bias, dilation=dilation,
                causal=causal,
            )
    pad = (k - 1) * dilation
    c_g = conv_kernel.shape[-1]
    c_s0 = skip_kernel.shape[-1]
    c_a0 = c.shape[-1]

    # Mosaic requires 128-lane-aligned slices: zero-pad every channel dim
    # (zero rows/cols contribute nothing to the matmuls)
    c_r = _round_up(c_r0)
    c_s = _round_up(c_s0)
    c_a = _round_up(c_a0)
    assert c_g % 256 == 0 or c_g % 2 == 0
    x = _pad_last(x, c_r)
    c = _pad_last(c, c_a)
    conv_kernel = _pad_axis(conv_kernel, 1, c_r)
    aux_kernel = _pad_axis(aux_kernel, 0, c_a)
    skip_kernel = _pad_last(skip_kernel, c_s)
    skip_bias = _pad_last(skip_bias, c_s)
    res_kernel = _pad_last(res_kernel, c_r)
    res_bias = _pad_last(res_bias, c_r)

    t_tile = min(t_tile, _round_up(t, 8))
    n_tiles = -(-t // t_tile)
    t_padded = n_tiles * t_tile
    # sublane-align the DMA'd halo block (t_tile + pad rows)
    halo_rows = _round_up(t_tile + pad, 8)
    extra = halo_rows - (t_tile + pad)

    # time-pad x so every tap is a static in-bounds slice of the halo block
    if causal:
        lpad, rpad = pad, (t_padded - t) + extra
        center_off = pad
    else:
        lpad = pad // 2
        rpad = (pad - pad // 2) + (t_padded - t) + extra
        center_off = pad // 2
    xp = jnp.pad(x, ((0, 0), (lpad, rpad), (0, 0)))
    cp = jnp.pad(c, ((0, 0), (0, t_padded - t), (0, 0)))

    kernel = functools.partial(
        _kernel,
        t_tile=t_tile,
        dilation=dilation,
        n_taps=k,
        center_off=center_off,
        halo_rows=halo_rows,
    )
    res, skip = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xp: manual halo DMA
            pl.BlockSpec(
                (1, t_tile, c_a), lambda bb, ii: (bb, ii, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, c_r, c_g), lambda bb, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_g), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_a, c_g), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_g // 2, c_s), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_s), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_g // 2, c_r), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_r), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile, c_r), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, c_s), lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_padded, c_r), x.dtype),
            jax.ShapeDtypeStruct((b, t_padded, c_s), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((halo_rows, c_r), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        xp,
        cp,
        conv_kernel,
        conv_bias[None, :],
        aux_kernel,
        skip_kernel,
        skip_bias[None, :],
        res_kernel,
        res_bias[None, :],
    )
    return res[:, :t, :c_r0], skip[:, :t, :c_s0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_gated_resblock(
    x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel, skip_bias,
    res_kernel, res_bias, dilation: int = 1, causal: bool = False,
    t_tile: int = 1024, interpret: bool = False,
):
    """Fused gated WaveNet residual block (Pallas forward, remat backward)."""
    return _pallas_forward(
        x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel, skip_bias,
        res_kernel, res_bias, dilation, causal, t_tile, interpret,
    )


def _fwd(x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel, skip_bias,
         res_kernel, res_bias, dilation, causal, t_tile, interpret):
    out = _pallas_forward(
        x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel, skip_bias,
        res_kernel, res_bias, dilation, causal, t_tile, interpret,
    )
    residuals = (
        x, c, conv_kernel, conv_bias, aux_kernel, skip_kernel, skip_bias,
        res_kernel, res_bias,
    )
    return out, residuals


def _bwd(dilation, causal, t_tile, interpret, residuals, cotangents):
    def ref_fn(*args):
        return gated_resblock_xla(*args, dilation=dilation, causal=causal)

    _, vjp = jax.vjp(ref_fn, *residuals)
    return vjp(cotangents)


fused_gated_resblock.defvjp(_fwd, _bwd)
