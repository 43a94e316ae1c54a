"""HiFi-GAN model tests: shapes, causality, tiny-hyperparameter smoke.

Mirrors the reference test strategy (test/test_hifigan.py): tiny models,
forward shape checks, causal no-future-leakage property."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiPeriodDiscriminator,
    HiFiGANMultiScaleDiscriminator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)


def tiny_gen_kwargs(**kw):
    d = dict(
        in_channels=5,
        out_channels=1,
        channels=32,
        kernel_size=7,
        upsample_scales=(4, 4),
        upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3), (1, 3)),
        use_additional_convs=True,
    )
    d.update(kw)
    return d


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"use_additional_convs": False},
        {"use_causal_conv": True},
        {"use_weight_norm": False},
        {"out_channels": 4},
    ],
)
def test_hifigan_generator_shapes(kwargs):
    g = HiFiGANGenerator(**tiny_gen_kwargs(**kwargs))
    c = jnp.array(np.random.randn(2, 16, 5), dtype=jnp.float32)
    params = g.init(jax.random.key(0), c)
    y = g.apply(params, c)
    assert y.shape == (2, 16 * 16, kwargs.get("out_channels", 1))
    assert np.isfinite(np.asarray(y)).all()


def test_hifigan_generator_causality():
    """Identical first halves of conditioning -> identical first-half audio."""
    g = HiFiGANGenerator(**tiny_gen_kwargs(use_causal_conv=True))
    rng = np.random.RandomState(0)
    c1 = rng.randn(1, 20, 5).astype(np.float32)
    c2 = c1.copy()
    c2[:, 10:] = rng.randn(1, 10, 5)
    params = g.init(jax.random.key(0), jnp.array(c1))
    y1 = np.asarray(g.apply(params, jnp.array(c1)))
    y2 = np.asarray(g.apply(params, jnp.array(c2)))
    upsample = 16
    np.testing.assert_allclose(
        y1[:, : 10 * upsample], y2[:, : 10 * upsample], rtol=1e-5, atol=1e-5
    )


def test_period_discriminator_outputs():
    d = HiFiGANMultiPeriodDiscriminator(
        periods=(2, 3),
        discriminator_params={
            "channels": 8,
            "downsample_scales": [3, 3, 1],
            "max_downsample_channels": 32,
        },
    )
    x = jnp.array(np.random.randn(2, 256, 1), dtype=jnp.float32)
    params = d.init(jax.random.key(0), x)
    outs = d.apply(params, x)
    assert len(outs) == 2
    assert all(len(o) == 4 for o in outs)  # 3 conv layers + output


def test_scale_discriminator_outputs():
    d = HiFiGANMultiScaleDiscriminator(
        scales=2,
        discriminator_params={
            "channels": 16,
            "downsample_scales": [2, 2, 1],
            "max_downsample_channels": 64,
            "max_groups": 4,
        },
    )
    x = jnp.array(np.random.randn(2, 256, 1), dtype=jnp.float32)
    params = d.init(jax.random.key(0), x)
    outs = d.apply(params, x)
    assert len(outs) == 2
    assert all(len(o) == 6 for o in outs)  # first + 3 downsample + 2 final


def test_msmpd_with_official_norm_spectral_state():
    d = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=2,
        scale_discriminator_params={
            "channels": 16,
            "downsample_scales": [2, 1],
            "max_downsample_channels": 32,
            "max_groups": 4,
        },
        follow_official_norm=True,
        periods=(2, 3),
        period_discriminator_params={
            "channels": 8,
            "downsample_scales": [3, 1],
            "max_downsample_channels": 16,
        },
    )
    x = jnp.array(np.random.randn(2, 128, 1), dtype=jnp.float32)
    variables = d.init(jax.random.key(0), x)
    assert "spectral" in variables  # first scale D uses spectral norm
    outs, new_state = d.apply(variables, x, mutable=["spectral"])
    assert len(outs) == 4  # 2 scales + 2 periods
    # power iteration updated u
    old_u = jax.tree_util.tree_leaves(variables["spectral"])[0]
    new_u = jax.tree_util.tree_leaves(new_state["spectral"])[0]
    assert not np.allclose(np.asarray(old_u), np.asarray(new_u))
