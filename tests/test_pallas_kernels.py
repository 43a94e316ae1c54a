"""Equivalence tests for the Pallas fused WaveNet block (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.ops.pallas_kernels.wavenet import (
    fused_gated_resblock,
    gated_resblock_xla,
)


def _args(seed=0, B=2, T=300, Cr=8, Cg=16, Cs=8, Ca=10, K=3):
    rs = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(a, jnp.float32)
        for a in (
            rs.randn(B, T, Cr),
            rs.randn(B, T, Ca),
            rs.randn(K, Cr, Cg) * 0.3,
            rs.randn(Cg) * 0.3,
            rs.randn(Ca, Cg) * 0.3,
            rs.randn(Cg // 2, Cs) * 0.3,
            rs.randn(Cs) * 0.3,
            rs.randn(Cg // 2, Cr) * 0.3,
            rs.randn(Cr) * 0.3,
        )
    )


@pytest.mark.parametrize("dilation", [1, 4])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_matches_xla(dilation, causal):
    args = _args()
    r0, s0 = gated_resblock_xla(*args, dilation=dilation, causal=causal)
    r1, s1 = fused_gated_resblock(*args, dilation, causal, 128, True)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-5)


def test_fused_gradients_match():
    args = _args(1)

    def loss(fn, *a):
        r, s = fn(*a)
        return jnp.sum(r**2) + jnp.sum(s**2)

    g_ref = jax.grad(
        lambda *a: loss(
            lambda *b: gated_resblock_xla(*b, dilation=2, causal=False), *a
        )
    )(*args)
    g_fused = jax.grad(
        lambda *a: loss(lambda *b: fused_gated_resblock(*b, 2, False, 128, True), *a)
    )(*args)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_fused), atol=2e-4)


def test_pwg_generator_pallas_flag_equivalence():
    """Same params, same output with and without the fused path."""
    kwargs = dict(
        layers=2,
        stacks=1,
        residual_channels=8,
        gate_channels=16,
        skip_channels=8,
        aux_channels=10,
        aux_context_window=0,
        upsample_conditional_features=False,
    )
    G0 = get_model_class("ParallelWaveGANGenerator")(**kwargs)
    G1 = get_model_class("ParallelWaveGANGenerator")(
        **kwargs, use_pallas_kernels=True
    )
    key = jax.random.key(0)
    z = jax.random.normal(key, (2, 200, 1))
    c = jax.random.normal(key, (2, 200, 10))
    params = G0.init(key, z, c)
    y0 = G0.apply(params, z, c)
    y1 = G1.apply(params, z, c)  # identical param tree
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)
