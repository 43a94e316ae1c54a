"""Equivalence tests for the fused MelGAN residual-stack kernel.

The kernel (ops/pallas_kernels/melgan_stack.py) fuses one upsample
stage's sequential ResidualStacks — optionally plus the generator's
trailing act -> out conv -> tanh — into a single Pallas call. These
tests pin it (interpret mode on CPU) against the plain flax path on the
same param tree, across channel widths (pow2 and not), pad modes,
bias/no-bias, and both MelGAN and multi-band MelGAN generator shapes
(reference models/melgan.py:17-257, layers/residual_stack.py:13-85).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.ops.pallas_kernels.melgan_stack import (
    fused_melgan_stacks,
    melgan_stacks_xla,
)


def _stacks(rs, C, dilations=(1, 3, 9), k=3, bias=True):
    out = []
    for d in dilations:
        out.append({
            "wd": jnp.asarray(rs.randn(k, C, C) * 0.2, jnp.float32),
            "bd": jnp.asarray(rs.randn(C) * 0.2, jnp.float32) if bias else None,
            "w1": jnp.asarray(rs.randn(1, C, C) * 0.2, jnp.float32),
            "b1": jnp.asarray(rs.randn(C) * 0.2, jnp.float32) if bias else None,
            "ws": jnp.asarray(rs.randn(1, C, C) * 0.2, jnp.float32),
            "bs": jnp.asarray(rs.randn(C) * 0.2, jnp.float32) if bias else None,
            "dilation": d,
        })
    return out


@pytest.mark.parametrize("c0,t,pad_mode", [
    (32, 500, "reflect"),
    (64, 333, "reflect"),
    (128, 256, "reflect"),
    (24, 300, "edge"),      # non-pow2 channels, replication pad
    (48, 200, "constant"),  # non-pow2, zero pad
])
def test_fused_stacks_match_xla(c0, t, pad_mode):
    rs = np.random.RandomState(0)
    stacks = _stacks(rs, c0)
    x = jnp.asarray(rs.randn(2, t, c0), jnp.float32)
    y0 = melgan_stacks_xla(x, stacks, pad_mode=pad_mode)
    y1 = fused_melgan_stacks(x, stacks, pad_mode=pad_mode, t_tile=64,
                             interpret=True)
    # unnormalized random stacks amplify to |y| ~ 1e2; tolerance scales
    # with the output magnitude (pure accumulation-order fp32 noise)
    atol = 5e-5 * max(1.0, float(jnp.max(jnp.abs(y0))))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=atol)


@pytest.mark.parametrize("out_ch,bias", [(1, True), (4, False)])
def test_fused_stacks_with_final_conv(out_ch, bias):
    """Trailing act -> k7 out conv -> tanh folded into the kernel."""
    rs = np.random.RandomState(1)
    c0 = 32
    stacks = _stacks(rs, c0, bias=bias)
    fw = jnp.asarray(rs.randn(7, c0, out_ch) * 0.2, jnp.float32)
    fb = jnp.asarray(rs.randn(out_ch) * 0.2, jnp.float32) if bias else None
    x = jnp.asarray(rs.randn(1, 400, c0), jnp.float32)
    y0 = melgan_stacks_xla(x, stacks, final=(fw, fb))
    y1 = fused_melgan_stacks(x, stacks, final=(fw, fb), t_tile=64,
                             interpret=True)
    assert y1.shape == (1, 400, out_ch)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)


def test_short_sequence_falls_back():
    """t <= 2*receptive radius: full XLA fallback, still exact."""
    rs = np.random.RandomState(2)
    stacks = _stacks(rs, 32, dilations=(1, 3))
    x = jnp.asarray(rs.randn(1, 7, 32), jnp.float32)
    y0 = melgan_stacks_xla(x, stacks)
    y1 = fused_melgan_stacks(x, stacks, interpret=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)


@pytest.mark.parametrize("kwargs", [
    # melgan.v1 shape at small scale: stages 128 -> 64 -> 32 all fused
    dict(in_channels=80, out_channels=1, channels=256,
         upsample_scales=(4, 4, 4), stacks=2),
    # multi-band (out_channels=4), no-bias, non-pow2 stage widths 96/48/24
    dict(in_channels=80, out_channels=4, channels=192,
         upsample_scales=(2, 4, 8), stacks=3, bias=False),
    # replication pad + no final tanh (final conv stays in XLA)
    dict(in_channels=80, out_channels=1, channels=128,
         upsample_scales=(4, 4), stacks=2, pad="ReplicationPad1d",
         use_final_nonlinear_activation=False),
])
def test_melgan_generator_flag_equivalence(kwargs):
    """use_pallas_stacks=True on the SAME param tree == plain path."""
    G0 = get_model_class("MelGANGenerator")(**kwargs)
    G1 = get_model_class("MelGANGenerator")(**kwargs, use_pallas_stacks=True)
    key = jax.random.key(0)
    c = jax.random.normal(key, (2, 24, 80))
    params = G0.init(key, c)
    y0 = G0.apply(params, c)
    y1 = G1.apply(params, c)  # identical param tree
    assert y0.shape == y1.shape
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)


def test_melgan_generator_causal_ignores_flag():
    """Causal configs are outside the kernel's domain: flag is a no-op."""
    kwargs = dict(in_channels=80, out_channels=1, channels=128,
                  upsample_scales=(4, 4), stacks=2, use_causal_conv=True)
    G0 = get_model_class("MelGANGenerator")(**kwargs)
    G1 = get_model_class("MelGANGenerator")(**kwargs, use_pallas_stacks=True)
    key = jax.random.key(0)
    c = jax.random.normal(key, (1, 16, 80))
    params = G0.init(key, c)
    np.testing.assert_allclose(
        np.asarray(G0.apply(params, c)), np.asarray(G1.apply(params, c)),
        atol=0,
    )
