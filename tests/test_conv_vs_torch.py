"""Numerical parity of conv primitives against torch (CPU) ground truth.

These tests pin the exact length math and kernel-layout conventions that the
checkpoint converter relies on: gather-form (K, Cin, Cout) kernels, torch
ConvTranspose1d padding/output_padding semantics, causal trims, weight-norm
(g, v) parameterization, and AvgPool1d.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from parallelwavegan_tpu.ops.conv import (  # noqa: E402
    causal_conv1d_pad,
    conv1d,
    conv_transpose1d,
)
from parallelwavegan_tpu.models.hifigan import avg_pool1d  # noqa: E402


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [
        (3, 5, 7, 1, 3, 1, 1),
        (4, 8, 3, 2, 1, 1, 1),
        (6, 6, 3, 1, 2, 2, 1),
        (8, 8, 41, 2, 20, 1, 4),
        (5, 7, 1, 1, 0, 1, 1),
    ],
)
def test_conv1d_matches_torch(cin, cout, k, stride, pad, dil, groups):
    x = _rand(2, 50, cin)
    w = _rand(k, cin // groups, cout)
    b = _rand(cout)

    y = conv1d(jnp.array(x), jnp.array(w), jnp.array(b),
               stride=stride, padding=pad, dilation=dil, groups=groups)

    tconv = torch.nn.Conv1d(cin, cout, k, stride=stride, padding=pad,
                            dilation=dil, groups=groups)
    with torch.no_grad():
        # torch weight (Cout, Cin/groups, K) <- ours (K, Cin/groups, Cout)
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(b))
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,opad",
    [
        (4, 6, 16, 8, 4, 0),
        (4, 6, 16, 8, 4, 1),
        (3, 3, 4, 2, 1, 0),
        (5, 2, 10, 5, 3, 0),
        (2, 2, 3, 1, 0, 0),
    ],
)
def test_conv_transpose1d_matches_torch(cin, cout, k, stride, pad, opad):
    x = _rand(2, 20, cin)
    # ours: gather-form (K, Cin, Cout); torch: (Cin, Cout, K) flipped on K
    w = _rand(k, cin, cout)
    b = _rand(cout)

    y = conv_transpose1d(jnp.array(x), jnp.array(w), jnp.array(b),
                         stride=stride, padding=pad, output_padding=opad)

    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad,
                                     output_padding=opad)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w[::-1].copy().transpose(1, 2, 0)))
        tconv.bias.copy_(torch.from_numpy(b))
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    assert y.shape == ty.shape
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)


def test_causal_conv_is_causal_and_length_preserving():
    cin = cout = 4
    k, dil = 5, 2
    w = _rand(k, cin, cout)
    x1 = _rand(1, 40, cin)
    x2 = x1.copy()
    x2[:, 20:] = _rand(1, 20, cin)

    def f(x):
        xp = causal_conv1d_pad(jnp.array(x), k, dil)
        return np.asarray(conv1d(xp, jnp.array(w), dilation=dil))

    y1, y2 = f(x1), f(x2)
    assert y1.shape == (1, 40, cout)
    np.testing.assert_allclose(y1[:, :20], y2[:, :20], rtol=1e-5, atol=1e-5)


def test_avg_pool1d_matches_torch():
    x = _rand(2, 33, 3)
    y = avg_pool1d(jnp.array(x), 4, 2, 2)
    ty = torch.nn.AvgPool1d(4, 2, 2)(
        torch.from_numpy(x.transpose(0, 2, 1))
    ).numpy().transpose(0, 2, 1)
    assert y.shape == ty.shape
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-5, atol=1e-5)


def test_weight_norm_matches_torch_conv1d():
    """flax Conv1d weight-norm (g, v) == torch.nn.utils.weight_norm."""
    import jax
    from parallelwavegan_tpu.layers.convs import Conv1d

    cin, cout, k = 4, 6, 5
    x = _rand(2, 30, cin)

    m = Conv1d(features=cout, kernel_size=k, padding=2, norm="weight")
    params = m.init(jax.random.key(0), jnp.array(x))
    y = m.apply(params, jnp.array(x))

    tconv = torch.nn.Conv1d(cin, cout, k, padding=2)
    v = np.asarray(params["params"]["v"])  # (K, Cin, Cout)
    g = np.asarray(params["params"]["g"])  # (1, 1, Cout)
    b = np.asarray(params["params"]["bias"])
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(v.transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(b))
    tconv = torch.nn.utils.weight_norm(tconv)
    with torch.no_grad():
        tconv.weight_g.copy_(torch.from_numpy(g.reshape(cout, 1, 1)))
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)


def test_weight_norm_matches_torch_conv_transpose1d():
    import jax
    from parallelwavegan_tpu.layers.convs import ConvTranspose1d

    cin, cout, k, stride, pad = 4, 6, 8, 4, 2
    x = _rand(2, 12, cin)

    m = ConvTranspose1d(features=cout, kernel_size=k, stride=stride,
                        padding=pad, norm="weight")
    params = m.init(jax.random.key(0), jnp.array(x))
    y = m.apply(params, jnp.array(x))

    v = np.asarray(params["params"]["v"])  # (K, Cin, Cout) gather-form
    g = np.asarray(params["params"]["g"])  # (1, Cin, 1)
    b = np.asarray(params["params"]["bias"])
    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(v[::-1].copy().transpose(1, 2, 0)))
        tconv.bias.copy_(torch.from_numpy(b))
    tconv = torch.nn.utils.weight_norm(tconv)  # dim=0 -> per input channel
    with torch.no_grad():
        tconv.weight_g.copy_(torch.from_numpy(g.reshape(cin, 1, 1)))
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    assert y.shape == ty.shape
    np.testing.assert_allclose(np.asarray(y), ty, rtol=1e-4, atol=1e-4)


def test_dense_groups_lowering_matches_grouped():
    """Block-diagonal dense lowering of grouped convs (ops/conv.py) is
    numerically identical to the grouped path — forward and gradients —
    for the MelGAN-D downsample shapes (Cin//groups == 4)."""
    import jax
    from parallelwavegan_tpu.ops.conv import conv1d

    rs = np.random.RandomState(0)
    for cin, cout, k, stride, groups in [
        (16, 64, 41, 4, 4),
        (64, 256, 41, 4, 16),
        (8, 8, 5, 1, 2),
    ]:
        x = jnp.asarray(rs.randn(2, 128, cin), jnp.float32)
        w = jnp.asarray(rs.randn(k, cin // groups, cout) * 0.1, jnp.float32)
        b = jnp.asarray(rs.randn(cout) * 0.1, jnp.float32)

        def f_grouped(x, w, b):
            return conv1d(x, w, b, stride=stride, padding=(k - 1) // 2,
                          groups=groups, dense_groups=False)

        def f_dense(x, w, b):
            return conv1d(x, w, b, stride=stride, padding=(k - 1) // 2,
                          groups=groups, dense_groups=True)

        ya = f_grouped(x, w, b)
        yb = f_dense(x, w, b)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-5, atol=1e-5)

        def loss(f):
            def inner(x, w, b):
                y = f(x, w, b)
                return jnp.sum(jnp.sin(y))
            return inner

        ga = jax.grad(loss(f_grouped), argnums=(0, 1, 2))(x, w, b)
        gb = jax.grad(loss(f_dense), argnums=(0, 1, 2))(x, w, b)
        for a_, b_ in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)
