"""Gradient equivalence of the training-capable fused MelGAN stacks.

The custom_vjp reverse kernel (ops/pallas_kernels/melgan_stack_train.py)
must produce the same dx/dweights as XLA autodiff of the XLA twin chain
— including across tile boundaries (halo'd recompute), the reflect-pad
edge windows (differentiable stitching), the optional fused trailing
``act -> out conv -> tanh``, and the shift-table weight-grad unpacking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.ops.pallas_kernels.melgan_stack import (
    melgan_stacks_xla,
    substitute_biases,
)
from parallelwavegan_tpu.ops.pallas_kernels.melgan_stack_train import (
    fused_melgan_stacks_train,
)


def _rand_stacks(rs, c, k=3, n=3, bias=True, scale=0.1):
    def w(kk, cin, cout):
        return jnp.asarray(rs.randn(kk, cin, cout) * scale, jnp.float32)

    def b(cout):
        return (jnp.asarray(rs.randn(cout) * 0.05, jnp.float32)
                if bias else None)

    return [
        {"wd": w(k, c, c), "bd": b(c), "w1": w(1, c, c), "b1": b(c),
         "ws": w(1, c, c), "bs": b(c), "dilation": k ** j}
        for j in range(n)
    ]


def _tree_check(g_ref, g_ker, atol=2e-4):
    la = jax.tree_util.tree_leaves_with_path(g_ref)
    lb = jax.tree_util.tree_leaves(g_ker)
    assert len(la) == len(lb)
    for (path, va), vb in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=atol, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("c", [32, 64])
@pytest.mark.parametrize(
    "t,t_tile", [(256, 64), (272, 16)]
)  # multi-tile / ragged final tile
@pytest.mark.parametrize("pad_mode", ["reflect", "constant"])
def test_fused_stack_grads_match_xla(c, t, t_tile, pad_mode):
    rs = np.random.RandomState(0)
    stacks = _rand_stacks(rs, c)
    x = jnp.asarray(rs.randn(2, t, c) * 0.5, jnp.float32)

    def loss_ref(x, ws):
        sts = [dict(st, **w) for st, w in zip(stacks, ws)]
        sts, _ = substitute_biases(sts, None, c)
        y = melgan_stacks_xla(x, sts, pad_mode=pad_mode)
        return jnp.mean(y ** 2)

    def loss_ker(x, ws):
        sts = [dict(st, **w) for st, w in zip(stacks, ws)]
        y = fused_melgan_stacks_train(
            x, sts, pad_mode=pad_mode, t_tile=t_tile, interpret=True)
        return jnp.mean(y ** 2)

    keys = ("wd", "bd", "w1", "b1", "ws", "bs")
    ws = [{k: st[k] for k in keys} for st in stacks]
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, ws)
    v_ker, g_ker = jax.value_and_grad(loss_ker, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(float(v_ref), float(v_ker), rtol=1e-5)
    _tree_check(g_ref, g_ker)


@pytest.mark.parametrize("out_ch", [1, 4])
def test_fused_stack_grads_with_final(out_ch):
    """Last stage: fused trailing act -> k7 out conv -> tanh."""
    c, t = 32, 192
    rs = np.random.RandomState(1)
    stacks = _rand_stacks(rs, c)
    fw = jnp.asarray(rs.randn(7, c, out_ch) * 0.1, jnp.float32)
    fb = jnp.asarray(rs.randn(out_ch) * 0.05, jnp.float32)
    x = jnp.asarray(rs.randn(1, t, c) * 0.5, jnp.float32)

    keys = ("wd", "bd", "w1", "b1", "ws", "bs")
    ws = [{k: st[k] for k in keys} for st in stacks]

    def loss(x, ws, fw, fb, fused):
        sts = [dict(st, **w) for st, w in zip(stacks, ws)]
        if fused:
            y = fused_melgan_stacks_train(
                x, sts, final=(fw, fb), t_tile=16, interpret=True)
        else:
            sts, final = substitute_biases(sts, (fw, fb), c)
            y = melgan_stacks_xla(x, sts, final=final)
        return jnp.mean(jnp.abs(y))

    args = (x, ws, fw, fb)
    v_ref, g_ref = jax.value_and_grad(
        lambda *a: loss(*a, False), argnums=(0, 1, 2, 3))(*args)
    v_ker, g_ker = jax.value_and_grad(
        lambda *a: loss(*a, True), argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v_ref), float(v_ker), rtol=1e-5)
    _tree_check(g_ref, g_ker)


def test_no_bias_grads():
    c, t = 32, 160
    rs = np.random.RandomState(2)
    stacks = _rand_stacks(rs, c, bias=False)
    x = jnp.asarray(rs.randn(1, t, c) * 0.5, jnp.float32)
    keys = ("wd", "w1", "ws")
    ws = [{k: st[k] for k in keys} for st in stacks]

    def loss(x, ws, fused):
        sts = [dict(st, **w, bd=None, b1=None, bs=None)
               for st, w in zip(stacks, ws)]
        if fused:
            y = fused_melgan_stacks_train(x, sts, t_tile=16, interpret=True)
        else:
            sts, _ = substitute_biases(sts, None, c)
            y = melgan_stacks_xla(x, sts)
        return jnp.mean(y ** 2)

    g_ref = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1))(x, ws)
    g_ker = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1))(x, ws)
    _tree_check(g_ref, g_ker)


def test_generator_grads_with_stacks_train_flag():
    """use_pallas_stacks_train: full-generator grads match the default
    path (weight-norm reparam, deconvs, and out conv included)."""
    from parallelwavegan_tpu.models import get_model_class

    kwargs = dict(
        in_channels=20, out_channels=1, channels=128, kernel_size=7,
        upsample_scales=[4, 2], stacks=2,
    )
    cls = get_model_class("MelGANGenerator")
    g0 = cls(**kwargs)
    g1 = cls(**kwargs, use_pallas_stacks_train=True)
    rs = np.random.RandomState(3)
    c = jnp.asarray(rs.randn(2, 24, 20), jnp.float32)
    variables = g0.init(jax.random.key(0), c)

    def loss(mod, v):
        y = mod.apply(v, c)
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


def test_fused_stack_bf16_resident_grads_close():
    """bf16 activations (mixed-precision mode) make the kernels
    bf16-RESIDENT (bf16 HBM/VMEM streams, bf16 MXU operands, f32
    accumulators); values/grads must stay within bf16 rounding of the f32
    reference (structural errors would be O(1), not O(1e-2))."""
    c = 64
    rs = np.random.RandomState(7)
    stacks = _rand_stacks(rs, c)
    x = jnp.asarray(rs.randn(2, 256, c) * 0.5, jnp.float32)

    def loss_ref(x, ws):
        sts = [dict(st, **w) for st, w in zip(stacks, ws)]
        sts, _ = substitute_biases(sts, None, c)
        y = melgan_stacks_xla(x, sts, pad_mode="reflect")
        return jnp.mean(y ** 2)

    def loss_bf16(x, ws):
        sts = [dict(st, **w) for st, w in zip(stacks, ws)]
        y = fused_melgan_stacks_train(
            x.astype(jnp.bfloat16), sts, pad_mode="reflect", t_tile=32,
            interpret=True)
        return jnp.mean(y.astype(jnp.float32) ** 2)

    keys = ("wd", "bd", "w1", "b1", "ws", "bs")
    ws = [{k: st[k] for k in keys} for st in stacks]
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, ws)
    v_b, g_b = jax.value_and_grad(loss_bf16, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(float(v_ref), float(v_b), rtol=2e-2)
    for name, a, b in zip(["dx", "dweights"], g_ref, g_b):
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
