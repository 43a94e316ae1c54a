"""Fused HiFi-GAN tail kernel (ops/pallas_kernels/hifigan_tail.py).

Interpret-mode equivalence against the XLA twin and the generator-level
flag equivalence (identical param tree, same output)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.ops.pallas_kernels.hifigan_tail import (
    fused_hifigan_tail,
    hifigan_tail_xla,
)


def _make_blocks(rs, c, kernel_sizes=(3, 7, 11)):
    out = []
    for k in kernel_sizes:
        out.append({
            "w1": jnp.asarray(rs.randn(3, k, c, c) * 0.05, jnp.float32),
            "b1": jnp.asarray(rs.randn(3, c) * 0.01, jnp.float32),
            "w2": jnp.asarray(rs.randn(3, k, c, c) * 0.05, jnp.float32),
            "b2": jnp.asarray(rs.randn(3, c) * 0.01, jnp.float32),
            "dilations": (1, 3, 5),
        })
    return out


@pytest.mark.parametrize("c0,t0", [(128, 300), (64, 128), (32, 96)])
def test_tail_kernel_matches_xla(c0, t0):
    rs = np.random.RandomState(0)
    stages = []
    cin = c0
    for _ in range(2):
        cout = cin // 2
        stages.append({
            "deconv_w": jnp.asarray(rs.randn(4, cin, cout) * 0.05, jnp.float32),
            "deconv_b": jnp.asarray(rs.randn(cout) * 0.01, jnp.float32),
            "stride": 2, "padding": 1,
            "blocks": _make_blocks(rs, cout),
        })
        cin = cout
    final_w = jnp.asarray(rs.randn(7, cin, 1) * 0.05, jnp.float32)
    final_b = jnp.asarray(rs.randn(1) * 0.01, jnp.float32)
    x = jnp.asarray(rs.randn(2, t0, c0) * 0.1, jnp.float32)

    ref = hifigan_tail_xla(x, stages, final_w, final_b)
    got = fused_hifigan_tail(x, stages, final_w, final_b, t_tile=64,
                             interpret=True)
    assert got.shape == ref.shape == (2, t0 * 4, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_tail_kernel_pre_blocks():
    """Optional MRF at the input rate folds into the same kernel."""
    rs = np.random.RandomState(3)
    c0, t0 = 64, 120
    pre = _make_blocks(rs, c0, kernel_sizes=(3, 7))
    stages = []
    cin = c0
    for _ in range(2):
        cout = cin // 2
        stages.append({
            "deconv_w": jnp.asarray(rs.randn(4, cin, cout) * 0.05,
                                    jnp.float32),
            "deconv_b": jnp.asarray(rs.randn(cout) * 0.01, jnp.float32),
            "stride": 2, "padding": 1, "blocks": _make_blocks(rs, cout),
        })
        cin = cout
    final_w = jnp.asarray(rs.randn(7, cin, 1) * 0.05, jnp.float32)
    final_b = jnp.asarray(rs.randn(1) * 0.01, jnp.float32)
    x = jnp.asarray(rs.randn(1, t0, c0) * 0.1, jnp.float32)
    ref = hifigan_tail_xla(x, stages, final_w, final_b, pre_blocks=pre)
    got = fused_hifigan_tail(x, stages, final_w, final_b, pre_blocks=pre,
                             t_tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_hifigan_generator_tail_flag_equivalence():
    """use_pallas_tail=True: identical param tree, same waveform."""
    common = dict(
        in_channels=6, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    )
    cls = get_model_class("HiFiGANGenerator")
    G0 = cls(**common)
    G1 = cls(**common, use_pallas_tail=True, pallas_tail_tile=64)
    c = jnp.asarray(np.random.RandomState(0).randn(2, 37, 6), jnp.float32)
    p0 = G0.init(jax.random.key(0), c)
    p1 = G1.init(jax.random.key(0), c)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    y0 = G0.apply(p0, c)
    y1 = G1.apply(p0, c)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-6)


def test_discrete_trunk_tail_flag_equivalence():
    """DiscreteSymbolHiFiGANGenerator with use_pallas_tail: identical
    param tree, same waveform ((K-scale)//2 deconv padding path)."""
    common = dict(
        in_channels=24, out_channels=1, channels=32, kernel_size=7,
        num_embs=10, num_spk_embs=0,
        upsample_scales=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)),
    )
    cls = get_model_class("DiscreteSymbolHiFiGANGenerator")
    G0 = cls(**common)
    G1 = cls(**common, use_pallas_tail=True, pallas_tail_tile=64)
    tokens = np.random.RandomState(0).randint(0, 10, size=(2, 19, 1))
    c = jnp.asarray(tokens, jnp.int32)
    p0 = G0.init(jax.random.key(0), c)
    p1 = G1.init(jax.random.key(0), c)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    y0 = G0.apply(p0, c)
    y1 = G1.apply(p0, c)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-6)


def test_tail_flag_falls_back_when_unsupported():
    """Non-power-of-2 tail channels or odd strides keep the XLA path."""
    common = dict(
        in_channels=6, out_channels=1, channels=24, kernel_size=7,
        upsample_scales=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    cls = get_model_class("HiFiGANGenerator")
    G = cls(**common, use_pallas_tail=True)
    c = jnp.asarray(np.random.RandomState(1).randn(1, 24, 6), jnp.float32)
    params = G.init(jax.random.key(0), c)
    y = G.apply(params, c)  # channels 24 -> tail entry 6: not pow2 -> XLA
    assert y.shape == (1, 24 * 64, 1)


def test_pallas_flags_fall_back_off_tpu(monkeypatch):
    """Shipped configs carry use_pallas_* flags; off-TPU (no interpret
    override) the module must silently use the XLA path and still produce
    the identical waveform."""
    from parallelwavegan_tpu.ops.pallas_kernels import pallas_backend_ok

    monkeypatch.delenv("PALLAS_INTERPRET_OK", raising=False)
    assert not pallas_backend_ok()  # CPU backend in tests

    cls = get_model_class("HiFiGANGenerator")
    common = dict(
        in_channels=6, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    )
    G0 = cls(**common)
    G1 = cls(**common, use_pallas_tail=True, use_pallas_mrf=True)
    c = jnp.asarray(np.random.RandomState(0).randn(1, 16, common["in_channels"]),
                    jnp.float32)
    v = G0.init(jax.random.key(0), c)
    y0 = G0.apply(v, c)
    y1 = G1.apply(v, c)  # same param tree: fused path is cosmetic
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
