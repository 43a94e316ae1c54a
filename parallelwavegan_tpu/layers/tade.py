"""StyleMelGAN TADE (Temporal Adaptive DE-normalization) layers, NTC layout.

Behavioral reference:
/root/reference/parallel_wavegan/layers/tade_res_block.py
(TADELayer :11-72: instance-norm x, upsample c, aux conv, gated conv ->
(cg1, cg2), y = cg1 * up(x) + cg2; TADEResBlock :75-160: 2x TADE + 2
gated softmax*tanh convs + upsampled residual).

TPU notes: instance norm is two reductions + one FMA, fused by XLA; the
nearest upsample is a broadcast-reshape; the channel-split gated activation
stays fused with the producing conv.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import Conv1d
from parallelwavegan_tpu.layers.upsample import stretch_time

Array = jax.Array


def instance_norm_1d(x: Array, eps: float = 1e-5) -> Array:
    """torch InstanceNorm1d (affine=False): per (batch, channel) over time."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class TADELayer(nn.Module):
    """TADE layer: modulate normalized x by conv features of (upsampled) c."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    bias: bool = True
    upsample_factor: int = 2
    upsample_mode: str = "nearest"
    norm: str | None = "weight"

    @nn.compact
    def __call__(self, x: Array, c: Array) -> tuple[Array, Array]:
        if self.upsample_mode != "nearest":
            raise ValueError("only nearest upsampling is supported")
        x = instance_norm_1d(x)
        c = stretch_time(c, self.upsample_factor)
        c = Conv1d(
            features=self.in_channels,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            name="aux_conv",
        )(c)
        cg = Conv1d(
            features=self.in_channels * 2,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            name="gated_conv",
        )(c)
        cg1, cg2 = jnp.split(cg, 2, axis=-1)
        y = cg1 * stretch_time(x, self.upsample_factor) + cg2
        return y, c


class TADEResBlock(nn.Module):
    """TADEResBlock: two TADE + gated convs with an upsampled residual."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    dilation: int = 2
    bias: bool = True
    upsample_factor: int = 2
    upsample_mode: str = "nearest"
    gated_function: str = "softmax"
    norm: str | None = "weight"

    @nn.compact
    def __call__(self, x: Array, c: Array) -> tuple[Array, Array]:
        if self.gated_function == "softmax":
            gate = lambda v: jax.nn.softmax(v, axis=-1)  # noqa: E731
        elif self.gated_function == "sigmoid":
            gate = jax.nn.sigmoid
        else:
            raise ValueError(f"{self.gated_function} is not supported.")

        residual = x
        x, c = TADELayer(
            in_channels=self.in_channels,
            aux_channels=self.aux_channels,
            kernel_size=self.kernel_size,
            bias=self.bias,
            upsample_factor=1,
            upsample_mode=self.upsample_mode,
            norm=self.norm,
            name="tade1",
        )(x, c)
        x = Conv1d(
            features=self.in_channels * 2,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            name="gated_conv1",
        )(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        x = gate(xa) * jnp.tanh(xb)

        x, c = TADELayer(
            in_channels=self.in_channels,
            aux_channels=self.in_channels,
            kernel_size=self.kernel_size,
            bias=self.bias,
            upsample_factor=self.upsample_factor,
            upsample_mode=self.upsample_mode,
            norm=self.norm,
            name="tade2",
        )(x, c)
        x = Conv1d(
            features=self.in_channels * 2,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=(self.kernel_size - 1) // 2 * self.dilation,
            use_bias=self.bias,
            norm=self.norm,
            name="gated_conv2",
        )(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        x = gate(xa) * jnp.tanh(xb)

        return stretch_time(residual, self.upsample_factor) + x, c
