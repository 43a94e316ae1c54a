"""Gradient equivalence of the training-capable fused WaveNet cycle.

The custom_vjp backward kernel (ops/pallas_kernels/wavenet_stack_train.py)
must produce the same dx/dc/dweights as XLA autodiff of the XLA twin —
including across tile boundaries (halo'd recompute) and sequence-end
padding (valid/owned masks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.ops.pallas_kernels.wavenet_stack import (
    wavenet_stack_xla,
)
from parallelwavegan_tpu.ops.pallas_kernels.wavenet_stack_train import (
    fused_wavenet_cycle_train,
)


def _make(L, B, T, Cr=8, Cg=16, Ca=8, Cs=8, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, T, Cr) * 0.3, jnp.float32)
    c = jnp.asarray(rs.randn(B, T, Ca) * 0.3, jnp.float32)
    weights = {
        "wconv": jnp.asarray(rs.randn(L, 3, Cr, Cg) * 0.2, jnp.float32),
        "bconv": jnp.asarray(rs.randn(L, Cg) * 0.1, jnp.float32),
        "waux": jnp.asarray(rs.randn(L, Ca, Cg) * 0.2, jnp.float32),
        "wskip": jnp.asarray(rs.randn(L, Cg // 2, Cs) * 0.2, jnp.float32),
        "bskip": jnp.asarray(rs.randn(L, Cs) * 0.1, jnp.float32),
        "wres": jnp.asarray(rs.randn(L, Cg // 2, Cr) * 0.2, jnp.float32),
        "bres": jnp.asarray(rs.randn(L, Cr) * 0.1, jnp.float32),
    }
    return x, c, weights


@pytest.mark.parametrize(
    "L,B,T,t_tile",
    [
        (4, 2, 256, 256),   # single tile
        (4, 2, 512, 128),   # multiple tiles: halo'd bwd recompute
        (4, 1, 300, 128),   # ragged final tile: seq-end masking
        (10, 1, 512, 256),  # full dilation cycle depth
    ],
)
def test_fused_cycle_grads_match_xla(L, B, T, t_tile):
    dils = tuple(2 ** (i % 10) for i in range(L))
    x, c, weights = _make(L, B, T)

    def loss_ref(x, c, w):
        xo, sk = wavenet_stack_xla(x, c, w, dils)
        return jnp.mean(xo ** 2) + 0.5 * jnp.mean(sk ** 2)

    def loss_ker(x, c, w):
        xo, sk = fused_wavenet_cycle_train(
            x, c, w, dils, t_tile=t_tile, interpret=True
        )
        return jnp.mean(xo ** 2) + 0.5 * jnp.mean(sk ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, c, weights)
    v_ker, g_ker = jax.value_and_grad(loss_ker, argnums=(0, 1, 2))(x, c, weights)

    np.testing.assert_allclose(float(v_ref), float(v_ker), rtol=1e-5)
    names = ["dx", "dc", "dweights"]
    for name, a, b in zip(names, g_ref, g_ker):
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves(b)
        for (path, va), vb in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), atol=2e-4, rtol=1e-3,
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )


def test_pwg_generator_grads_with_stack_train_flag():
    """use_pallas_stack_train: full-generator grads match the module's
    default path (weight-norm reparam + upsample included)."""
    from parallelwavegan_tpu.models import get_model_class

    params = dict(
        layers=4, stacks=2, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=10, aux_context_window=0,
        upsample_params={"upsample_scales": [4, 4]},
    )
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.randn(2, 128, 1), jnp.float32)
    c = jnp.asarray(rs.randn(2, 8, 10), jnp.float32)

    g_ref = get_model_class("ParallelWaveGANGenerator")(**params)
    g_ker = get_model_class("ParallelWaveGANGenerator")(
        **params, use_pallas_stack_train=True, pallas_stack_train_tile=64,
        pallas_stack_train_layers_per_call=2,
    )
    variables = g_ref.init(jax.random.key(0), z, c)

    def loss(mod, v):
        y = mod.apply(v, z, c)
        return jnp.mean(y ** 2)

    v_r, gr = jax.value_and_grad(lambda v: loss(g_ref, v))(variables)
    v_k, gk = jax.value_and_grad(lambda v: loss(g_ker, v))(variables)
    np.testing.assert_allclose(float(v_r), float(v_k), rtol=1e-5)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gr), jax.tree_util.tree_leaves(gk)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_chunked_cycle_grads_match_xla():
    """max_layers_per_call < L exercises the chunk-boundary residuals."""
    L = 6
    dils = tuple(2 ** (i % 3) for i in range(L))
    x, c, weights = _make(L, 2, 256)

    def loss_ref(w):
        xo, sk = wavenet_stack_xla(x, c, w, dils)
        return jnp.mean(xo ** 2) + jnp.mean(sk ** 2)

    def loss_ker(w):
        xo, sk = fused_wavenet_cycle_train(
            x, c, w, dils, t_tile=128, max_layers_per_call=2, interpret=True
        )
        return jnp.mean(xo ** 2) + jnp.mean(sk ** 2)

    g_ref = jax.grad(loss_ref)(weights)
    g_ker = jax.grad(loss_ker)(weights)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_ref[k]), np.asarray(g_ker[k]),
            atol=2e-4, rtol=1e-3, err_msg=k,
        )
