"""Analytic MXU-FLOP counter (benchmarks/flops.py) vs hand-computed MACs."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from flops import matmul_conv_flops  # noqa: E402


def test_dense_matmul_flops():
    a = jnp.zeros((4, 64))
    w = jnp.zeros((64, 128))
    got = matmul_conv_flops(lambda a, w: a @ w, a, w)
    assert got == 2 * 4 * 64 * 128


def test_batched_dot_general_flops():
    a = jnp.zeros((3, 5, 7))
    b = jnp.zeros((3, 7, 11))
    got = matmul_conv_flops(jnp.matmul, a, b)
    assert got == 2 * 3 * 5 * 11 * 7


def test_conv1d_flops():
    x = jnp.zeros((2, 8, 32))  # NCW
    w = jnp.zeros((16, 8, 3))  # OIW

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NCW", "OIW", "NCW")
        )

    # out (2, 16, 32); 2 * out_elems * k * in_ch
    assert matmul_conv_flops(f, x, w) == 2 * (2 * 16 * 32) * 3 * 8


def test_grouped_conv_divides_by_groups():
    x = jnp.zeros((1, 16, 32))
    w = jnp.zeros((16, 4, 3))  # 4 groups: in_ch_per_group = 4

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", feature_group_count=4,
            dimension_numbers=("NCW", "OIW", "NCW"),
        )

    assert matmul_conv_flops(f, x, w) == 2 * (1 * 16 * 32) * 3 * 4


def test_scan_multiplies_by_length():
    w = jnp.zeros((8, 8))

    def f(w):
        def body(c, _):
            return c @ w, ()

        c, _ = jax.lax.scan(body, jnp.zeros((4, 8)), None, length=10)
        return c

    assert matmul_conv_flops(f, w) == 10 * 2 * 4 * 8 * 8


def test_recurses_through_jit_and_grad():
    w = jnp.zeros((32, 32))
    x = jnp.zeros((4, 32))

    @jax.jit
    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    fwd = matmul_conv_flops(loss, w, x)
    assert fwd == 2 * 4 * 32 * 32
    # grad wrt w alone: fwd matmul + dW matmul (no dx term)
    assert matmul_conv_flops(jax.grad(loss), w, x) == 2 * fwd
    # grad wrt both operands: fwd + dW + dx
    assert matmul_conv_flops(jax.grad(loss, argnums=(0, 1)), w, x) == 3 * fwd


def test_generator_trace_is_cheap_and_nonzero():
    from parallelwavegan_tpu.models import get_model_class

    G = get_model_class("HiFiGANGenerator")(
        in_channels=80,
        channels=32,
        upsample_scales=(8, 8),
        upsample_kernel_sizes=(16, 16),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    c = jnp.zeros((1, 16, 80))
    params = G.init(jax.random.key(0), c)
    got = matmul_conv_flops(G.apply, params, c)
    assert got > 1e6  # real conv work found
    # sanity: larger batch scales linearly
    c4 = jnp.zeros((4, 16, 80))
    assert matmul_conv_flops(G.apply, params, c4) == pytest.approx(
        4 * got, rel=1e-6
    )
