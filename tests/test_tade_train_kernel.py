"""Gradient equivalence of the training-capable fused TADE blocks.

The custom_vjp backward kernels (ops/pallas_kernels/tade_train.py) must
produce the same dx/dc/dweights as XLA autodiff of the XLA twin chain —
including across tile boundaries (halo'd recompute), the two instance
norms' global rank-1 corrections, the packed stretch adjoint, and the
shift-table weight-grad unpacking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.ops.pallas_kernels.tade_decode import (
    tade_block_xla,
)
from parallelwavegan_tpu.ops.pallas_kernels.tade_train import (
    _WEIGHT_KEYS,
    fused_tade_blocks_train,
)

C = 64


def _rand_block(rs, aux_ch, scale, dilation):
    # gain per 9-tap 64-ch conv is ~sqrt(9*64)*s = 24*s; keep s small so
    # chained activations stay O(1) and the 2e-4 atol is meaningful (at
    # s=0.15 activations hit O(1e2) and plain f32 XLA autodiff itself is
    # ~2e-3 off an f64 ground truth — worse than the kernel)
    def w(k, cin, cout, s=0.04):
        return jnp.asarray(rs.randn(k, cin, cout) * s, jnp.float32)

    def b(cout, s=0.02):
        return jnp.asarray(rs.randn(cout) * s, jnp.float32)

    return {
        "aux1_w": w(9, aux_ch, C), "aux1_b": b(C),
        "g1_w": w(9, C, 2 * C), "g1_b": b(2 * C),
        "gc1_w": w(9, C, 2 * C), "gc1_b": b(2 * C),
        "aux2_w": w(9, C, C), "aux2_b": b(C),
        "g2_w": w(9, C, 2 * C), "g2_b": b(2 * C),
        "gc2_w": w(9, C, 2 * C), "gc2_b": b(2 * C),
        "scale": scale, "dilation": dilation,
    }


def _chain_xla(x, c, weight_list, statics, gated):
    for w, (s, d) in zip(weight_list, statics):
        blk = dict(w)
        blk["scale"], blk["dilation"] = s, d
        x, c = tade_block_xla(x, c, blk, gated_function=gated)
    return x, c


def _chain_fused(x, c, weight_list, statics, gated, t_tile):
    blocks = []
    for w, (s, d) in zip(weight_list, statics):
        blk = dict(w)
        blk["scale"], blk["dilation"] = s, d
        blocks.append(blk)
    return fused_tade_blocks_train(
        x, c, blocks, gated_function=gated, min_fused_t=1, t_tile=t_tile,
        interpret=True,
    )


@pytest.mark.parametrize("gated", ["softmax", "sigmoid"])
@pytest.mark.parametrize(
    "t0,t_tile", [(64, 32), (64, 8), (80, 16)]
)  # single tile / multi-tile / ragged final tile
def test_fused_tade_grads_match_xla(gated, t0, t_tile):
    scales = ((2, 2), (1, 2))  # scale-2 then scale-1 block, dilation 2
    rs = np.random.RandomState(0)
    weight_list = [
        {k: v for k, v in _rand_block(rs, C, s, d).items()
         if k in _WEIGHT_KEYS}
        for (s, d) in scales
    ]
    x = jnp.asarray(rs.randn(2, t0, C) * 0.5, jnp.float32)
    c = jnp.asarray(rs.randn(2, t0, C) * 0.5, jnp.float32)

    def loss_ref(x, c, ws):
        xo, co = _chain_xla(x, c, ws, scales, gated)
        return jnp.mean(xo ** 2) + 0.5 * jnp.mean(co ** 2)

    def loss_ker(x, c, ws):
        xo, co = _chain_fused(x, c, ws, scales, gated, t_tile)
        return jnp.mean(xo ** 2) + 0.5 * jnp.mean(co ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        x, c, weight_list)
    v_ker, g_ker = jax.value_and_grad(loss_ker, argnums=(0, 1, 2))(
        x, c, weight_list)

    np.testing.assert_allclose(float(v_ref), float(v_ker), rtol=1e-5)
    for name, a, b in zip(["dx", "dc", "dweights"], g_ref, g_ker):
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb)
        for (path, va), vb in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), atol=2e-4, rtol=1e-3,
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )


def test_first_block_fallback_grads():
    """80-ch mel-fed first block on the XLA twin, later block fused."""
    scales = ((2, 2), (2, 2))
    rs = np.random.RandomState(1)
    w0 = {k: v for k, v in _rand_block(rs, 80, 2, 2).items()
          if k in _WEIGHT_KEYS}
    w1 = {k: v for k, v in _rand_block(rs, C, 2, 2).items()
          if k in _WEIGHT_KEYS}
    x = jnp.asarray(rs.randn(1, 48, C) * 0.5, jnp.float32)
    c = jnp.asarray(rs.randn(1, 48, 80) * 0.5, jnp.float32)

    def loss(ws, fused):
        if fused:
            xo, _ = _chain_fused(x, c, ws, scales, "softmax", 16)
        else:
            xo, _ = _chain_xla(x, c, ws, scales, "softmax")
        return jnp.mean(jnp.abs(xo))

    g_ref = jax.grad(lambda ws: loss(ws, False))([w0, w1])
    g_ker = jax.grad(lambda ws: loss(ws, True))([w0, w1])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_generator_grads_with_tade_train_flag():
    """use_pallas_tade_train: full-generator grads match the default path
    (weight-norm reparam + noise upsample + output conv included)."""
    from parallelwavegan_tpu.models import get_model_class

    kwargs = dict(
        in_channels=16, aux_channels=20, channels=64, out_channels=1,
        kernel_size=9, dilation=2,
        noise_upsample_scales=[5, 2], upsample_scales=[2, 2, 1],
    )
    cls = get_model_class("StyleMelGANGenerator")
    g0 = cls(**kwargs)
    g1 = cls(**kwargs, use_pallas_tade_train=True,
             pallas_tade_train_min_t=16, pallas_tade_train_tile=16)
    rs = np.random.RandomState(3)
    c = jnp.asarray(rs.randn(2, 40, 20), jnp.float32)
    z = jnp.asarray(rs.randn(2, 4, 16), jnp.float32)
    variables = g0.init(jax.random.key(0), c, z)

    def loss(mod, v):
        y = mod.apply(v, c, z)
        return jnp.mean(y ** 2)

    v_r, gr = jax.value_and_grad(lambda v: loss(g0, v))(variables)
    v_k, gk = jax.value_and_grad(lambda v: loss(g1, v))(variables)
    np.testing.assert_allclose(float(v_r), float(v_k), rtol=1e-5)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gr),
        jax.tree_util.tree_leaves(gk),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_tade_bf16_mxu_grads_close():
    """bf16 activations (mixed-precision mode) flip the kernels' MXU
    operands to bfloat16; values/grads must stay within bf16 rounding of
    the f32 reference (structural errors would be O(1), not O(1e-2))."""
    scales = ((2, 2), (1, 2))
    rs = np.random.RandomState(5)
    weight_list = [
        {k: v for k, v in _rand_block(rs, C, s, d).items()
         if k in _WEIGHT_KEYS}
        for (s, d) in scales
    ]
    x = jnp.asarray(rs.randn(2, 64, C) * 0.5, jnp.float32)
    c = jnp.asarray(rs.randn(2, 64, C) * 0.5, jnp.float32)

    def loss_ref(x, c, ws):
        xo, co = _chain_xla(x, c, ws, scales, "softmax")
        return jnp.mean(xo ** 2) + 0.5 * jnp.mean(co ** 2)

    def loss_bf16(x, c, ws):
        xo, co = _chain_fused(
            x.astype(jnp.bfloat16), c.astype(jnp.bfloat16), ws, scales,
            "softmax", 16)
        return jnp.mean(xo.astype(jnp.float32) ** 2) + 0.5 * jnp.mean(
            co.astype(jnp.float32) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        x, c, weight_list)
    v_b, g_b = jax.value_and_grad(loss_bf16, argnums=(0, 1, 2))(
        x, c, weight_list)
    np.testing.assert_allclose(float(v_ref), float(v_b), rtol=2e-2)
    for name, a, b in zip(["dx", "dc", "dweights"], g_ref, g_b):
        for (path, va), vb in zip(
            jax.tree_util.tree_leaves_with_path(a),
            jax.tree_util.tree_leaves(b),
        ):
            va = np.asarray(va, np.float32)
            vb = np.asarray(vb, np.float32)
            denom = max(float(np.max(np.abs(va))), 1e-3)
            rel = float(np.max(np.abs(va - vb))) / denom
            assert rel < 6e-2, (
                f"{name}{jax.tree_util.keystr(path)}: rel={rel}")
