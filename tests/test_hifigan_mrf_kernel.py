"""Equivalence tests for the fused HiFi-GAN MRF kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.ops.pallas_kernels.hifigan_mrf import (
    fused_hifigan_mrf,
    hifigan_mrf_xla,
)


def _blocks(rs, C=8):
    out = []
    for k in (3, 7, 11):
        nd = 3
        out.append({
            "w1": jnp.asarray(rs.randn(nd, k, C, C) * 0.2, jnp.float32),
            "b1": jnp.asarray(rs.randn(nd, C) * 0.2, jnp.float32),
            "w2": jnp.asarray(rs.randn(nd, k, C, C) * 0.2, jnp.float32),
            "b2": jnp.asarray(rs.randn(nd, C) * 0.2, jnp.float32),
            "dilations": (1, 3, 5),
        })
    return out


def test_fused_mrf_matches_xla():
    rs = np.random.RandomState(0)
    blocks = _blocks(rs)
    x = jnp.asarray(rs.randn(2, 300, 8), jnp.float32)
    y0 = hifigan_mrf_xla(x, blocks)
    y1 = fused_hifigan_mrf(x, blocks, t_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)


def test_hifigan_generator_mrf_flag_equivalence():
    kwargs = dict(
        in_channels=10, channels=32,
        upsample_scales=[4, 4], upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 5], resblock_dilations=[[1, 3], [1, 3]],
    )
    G0 = get_model_class("HiFiGANGenerator")(**kwargs)
    G1 = get_model_class("HiFiGANGenerator")(
        **kwargs, use_pallas_mrf=True, pallas_mrf_tile=64
    )
    key = jax.random.key(0)
    c = jax.random.normal(key, (2, 20, 10))
    params = G0.init(key, c)
    y0 = G0.apply(params, c)
    y1 = G1.apply(params, c)  # identical param tree
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)


@pytest.mark.parametrize("c0,t", [(32, 400), (64, 333), (24, 256)])
def test_packed_mrf_matches_xla(c0, t):
    """Space-to-depth packed kernel == XLA twin (edge masking included)."""
    from parallelwavegan_tpu.ops.pallas_kernels.hifigan_mrf import (
        fused_hifigan_mrf_packed,
        hifigan_mrf_xla,
    )

    rs = np.random.RandomState(0)
    blocks = []
    for k in (3, 7, 11):
        blocks.append({
            "w1": jnp.asarray(rs.randn(3, k, c0, c0) * 0.05, jnp.float32),
            "b1": jnp.asarray(rs.randn(3, c0) * 0.01, jnp.float32),
            "w2": jnp.asarray(rs.randn(3, k, c0, c0) * 0.05, jnp.float32),
            "b2": jnp.asarray(rs.randn(3, c0) * 0.01, jnp.float32),
            "dilations": (1, 3, 5),
        })
    x = jnp.asarray(rs.randn(2, t, c0) * 0.1, jnp.float32)
    ref = hifigan_mrf_xla(x, blocks)
    got = fused_hifigan_mrf_packed(x, blocks, t_tile=64, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
