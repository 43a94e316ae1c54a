"""Fused TADE decode kernel equivalence (interpret mode on CPU).

Chain: flax TADEResBlock stack == XLA folded-weight twin == packed
Pallas kernels (tade_decode.py). Covers scale 2 and scale 1 blocks, the
dilated gated_conv2, softmax and sigmoid gates, odd lengths (packed-row
masking), and the mixed path where the 80-ch first block falls back to
the XLA twin while later blocks run fused.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.layers.tade import TADEResBlock
from parallelwavegan_tpu.ops.pallas_kernels.tade_decode import (
    fused_tade_blocks,
    tade_block_xla,
)

C = 64


def _flax_blocks(scales, aux0, key, gated="softmax", dilation=2):
    mods, params, ach = [], [], aux0
    for i, s in enumerate(scales):
        m = TADEResBlock(
            in_channels=C, aux_channels=ach, kernel_size=9,
            dilation=dilation, upsample_factor=s,
            gated_function=gated, norm=None,
        )
        x0 = jnp.zeros((1, 32, C))
        c0 = jnp.zeros((1, 32, ach))
        params.append(m.init(jax.random.fold_in(key, i), x0, c0)["params"])
        mods.append(m)
        ach = C
    return mods, params


def _fold(params, aux_ch):
    """flax TADEResBlock params -> tade_block_xla weight dict."""
    def wb(p):
        return np.asarray(p["kernel"]), np.asarray(p["bias"])

    blk = {}
    blk["aux1_w"], blk["aux1_b"] = wb(params["tade1"]["aux_conv"])
    blk["g1_w"], blk["g1_b"] = wb(params["tade1"]["gated_conv"])
    blk["gc1_w"], blk["gc1_b"] = wb(params["gated_conv1"])
    blk["aux2_w"], blk["aux2_b"] = wb(params["tade2"]["aux_conv"])
    blk["g2_w"], blk["g2_b"] = wb(params["tade2"]["gated_conv"])
    blk["gc2_w"], blk["gc2_b"] = wb(params["gated_conv2"])
    return blk


def _run_flax(mods, params, x, c):
    for m, p in zip(mods, params):
        x, c = m.apply({"params": p}, x, c)
    return x, c


def _run_twin(blocks, x, c, gated="softmax"):
    for blk in blocks:
        x, c = tade_block_xla(x, c, blk, gated_function=gated)
    return x, c


@pytest.mark.parametrize("gated", ["softmax", "sigmoid"])
def test_twin_matches_flax(gated):
    scales = (2, 2, 1)
    mods, params = _flax_blocks(scales, 64, jax.random.key(0), gated)
    blocks = [_fold(p, 64) for p in params]
    for i, (s, blk) in enumerate(zip(scales, blocks)):
        blk["scale"], blk["dilation"] = s, 2
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 48, C), jnp.float32)
    c = jnp.asarray(rs.randn(2, 48, 64), jnp.float32)
    xf, cf = _run_flax(mods, params, x, c)
    xt, ct = _run_twin(blocks, x, c, gated)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xt),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(ct),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gated", ["softmax", "sigmoid"])
@pytest.mark.parametrize("t0", [64, 50])  # even + non-multiple-of-tile
def test_fused_matches_twin(gated, t0):
    scales = (2, 1)
    mods, params = _flax_blocks(scales, C, jax.random.key(1), gated)
    blocks = [_fold(p, C) for p in params]
    for s, blk in zip(scales, blocks):
        blk["scale"], blk["dilation"] = s, 2
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, t0, C), jnp.float32)
    c = jnp.asarray(rs.randn(2, t0, C), jnp.float32)
    xt, ct = _run_twin(blocks, x, c, gated)
    xk, ck = fused_tade_blocks(
        x, c, blocks, gated_function=gated, min_fused_t=1, t_tile=16,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(ck),
                               rtol=2e-4, atol=2e-4)


def test_mixed_fallback_path():
    """80-ch first block on the XLA twin, later blocks fused."""
    scales = (2, 2)
    mods, params = _flax_blocks(scales, 80, jax.random.key(2))
    blocks = [_fold(p, 80 if i == 0 else C) for i, p in enumerate(params)]
    for s, blk in zip(scales, blocks):
        blk["scale"], blk["dilation"] = s, 2
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 40, C), jnp.float32)
    c = jnp.asarray(rs.randn(1, 40, 80), jnp.float32)
    xt, ct = _run_twin(blocks, x, c)
    xk, ck = fused_tade_blocks(
        x, c, blocks, min_fused_t=64, t_tile=16, interpret=True,
    )  # block 0: 40 < 64 -> twin; block 1: 80 >= 64 -> kernel
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ct), np.asarray(ck),
                               rtol=2e-4, atol=2e-4)


def test_generator_end_to_end_with_fused_tade():
    """Full StyleMelGANGenerator: use_pallas_tade output == baseline
    (same params; the collect path builds an identical param tree)."""
    from parallelwavegan_tpu.models import get_model_class

    kwargs = dict(
        in_channels=16, aux_channels=20, channels=64, out_channels=1,
        kernel_size=9, dilation=2,
        noise_upsample_scales=[5, 2], upsample_scales=[2, 2, 1],
    )
    cls = get_model_class("StyleMelGANGenerator")
    g0 = cls(**kwargs)
    g1 = cls(**kwargs, use_pallas_tade=True, pallas_tade_min_t=32,
             pallas_tade_tile=16)
    rs = np.random.RandomState(3)
    c = jnp.asarray(rs.randn(2, 40, 20), jnp.float32)
    z = jnp.asarray(rs.randn(2, 4, 16), jnp.float32)
    p0 = g0.init(jax.random.key(0), c, z)
    y0 = g0.apply(p0, c, z)
    # identical param tree -> the fused path consumes the same params
    y1 = g1.apply(p0, c, z)
    assert y0.shape == y1.shape
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)
