"""Causality property tests for causal model variants.

Mirrors the reference strategy (test/test_parallel_wavegan.py:314-358,
test/test_melgan.py:275, test/test_hifigan.py:198): feed two inputs that
agree on the first half and differ afterwards; causal generators must
produce bit-identical first-half outputs (no future leakage).
"""

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.models import get_model_class


def _split_pair(rs, shape):
    a = rs.randn(*shape).astype(np.float32)
    b = a.copy()
    half = shape[1] // 2
    b[:, half:] = rs.randn(*b[:, half:].shape)
    return jnp.asarray(a), jnp.asarray(b), half


def test_melgan_causal_no_future_leak():
    G = get_model_class("MelGANGenerator")(
        in_channels=10, channels=32, upsample_scales=[4, 4], stacks=2,
        use_causal_conv=True, pad="ConstantPad1d",
    )
    rs = np.random.RandomState(0)
    c1, c2, half = _split_pair(rs, (1, 16, 10))
    params = G.init(jax.random.key(0), c1)
    y1 = np.asarray(G.apply(params, c1))
    y2 = np.asarray(G.apply(params, c2))
    up = 16
    np.testing.assert_allclose(
        y1[:, : half * up], y2[:, : half * up], atol=1e-6
    )


def test_hifigan_causal_no_future_leak():
    G = get_model_class("HiFiGANGenerator")(
        in_channels=10, channels=32,
        upsample_scales=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        use_causal_conv=True,
    )
    rs = np.random.RandomState(1)
    c1, c2, half = _split_pair(rs, (1, 16, 10))
    params = G.init(jax.random.key(0), c1)
    y1 = np.asarray(G.apply(params, c1))
    y2 = np.asarray(G.apply(params, c2))
    up = 16
    np.testing.assert_allclose(
        y1[:, : half * up], y2[:, : half * up], atol=1e-6
    )


def test_pwg_causal_no_future_leak():
    G = get_model_class("ParallelWaveGANGenerator")(
        layers=4, stacks=2, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=10, aux_context_window=0,
        use_causal_conv=True,
        upsample_params={"upsample_scales": [4, 4]},
    )
    rs = np.random.RandomState(2)
    frames = 16
    c1, c2, half_f = _split_pair(rs, (1, frames, 10))
    z = jnp.asarray(rs.randn(1, frames * 16, 1).astype(np.float32))
    params = G.init(jax.random.key(0), z, c1)
    y1 = np.asarray(G.apply(params, z, c1))
    y2 = np.asarray(G.apply(params, z, c2))
    up = 16
    np.testing.assert_allclose(
        y1[:, : half_f * up], y2[:, : half_f * up], atol=1e-6
    )
