"""Equivalence tests for the fused whole-cycle WaveNet kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.ops.pallas_kernels.wavenet_stack import (
    fused_wavenet_cycle,
    wavenet_stack_xla,
)


def _weights(rs, L, K=3, Cr=8, Cg=16, Cs=8, Ca=10):
    return {
        "wconv": jnp.asarray(rs.randn(L, K, Cr, Cg) * 0.2, jnp.float32),
        "bconv": jnp.asarray(rs.randn(L, Cg) * 0.2, jnp.float32),
        "waux": jnp.asarray(rs.randn(L, Ca, Cg) * 0.2, jnp.float32),
        "wskip": jnp.asarray(rs.randn(L, Cg // 2, Cs) * 0.2, jnp.float32),
        "bskip": jnp.asarray(rs.randn(L, Cs) * 0.2, jnp.float32),
        "wres": jnp.asarray(rs.randn(L, Cg // 2, Cr) * 0.2, jnp.float32),
        "bres": jnp.asarray(rs.randn(L, Cr) * 0.2, jnp.float32),
    }


def test_fused_cycle_matches_xla():
    rs = np.random.RandomState(0)
    dil = (1, 2, 4, 8)
    w = _weights(rs, len(dil))
    x = jnp.asarray(rs.randn(2, 300, 8), jnp.float32)
    c = jnp.asarray(rs.randn(2, 300, 10), jnp.float32)
    x0, s0 = wavenet_stack_xla(x, c, w, dil)
    x1, s1 = fused_wavenet_cycle(x, c, w, dil, t_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=3e-5)


def test_fused_cycle_chunking_matches():
    rs = np.random.RandomState(1)
    dil = (1, 2, 4, 8, 16, 32)
    w = _weights(rs, len(dil))
    x = jnp.asarray(rs.randn(1, 400, 8), jnp.float32)
    c = jnp.asarray(rs.randn(1, 400, 10), jnp.float32)
    x0, s0 = wavenet_stack_xla(x, c, w, dil)
    x1, s1 = fused_wavenet_cycle(
        x, c, w, dil, t_tile=128, interpret=True, max_layers_per_call=2
    )
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=3e-5)


def test_pwg_generator_stack_flag_equivalence():
    kwargs = dict(
        layers=4, stacks=2, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=10, aux_context_window=2,
        upsample_params={"upsample_scales": [4, 4]},
    )
    G0 = get_model_class("ParallelWaveGANGenerator")(**kwargs)
    G1 = get_model_class("ParallelWaveGANGenerator")(
        **kwargs, use_pallas_stack=True
    )
    key = jax.random.key(0)
    z = jax.random.normal(key, (2, 16 * 16, 1))
    c = jax.random.normal(key, (2, 20, 10))
    params = G0.init(key, z, c)
    y0 = G0.apply(params, z, c)
    y1 = G1.apply(params, z, c)  # identical param tree
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=3e-5)
