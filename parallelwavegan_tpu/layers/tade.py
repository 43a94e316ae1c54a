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
    def __call__(self, x: Array, c: Array, *, collect_weights: bool = False):
        if self.upsample_mode != "nearest":
            raise ValueError("only nearest upsampling is supported")
        aux_conv = Conv1d(
            features=self.in_channels,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            name="aux_conv",
        )
        gated_conv = Conv1d(
            features=self.in_channels * 2,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            name="gated_conv",
        )
        if collect_weights:
            # folded effective weights for the fused decode kernel
            # (tade_decode.py); dummies only fix the conv input widths
            aw, ab = aux_conv(c, return_params=True)
            dummy = jnp.zeros(c.shape[:2] + (self.in_channels,), c.dtype)
            gw, gb = gated_conv(dummy, return_params=True)
            return {"aux_w": aw, "aux_b": ab, "g_w": gw, "g_b": gb}
        x = instance_norm_1d(x)
        c = stretch_time(c, self.upsample_factor)
        c = aux_conv(c)
        cg = gated_conv(c)
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
    def __call__(self, x: Array, c: Array, *, collect_weights: bool = False):
        if self.gated_function == "softmax":
            gate = lambda v: jax.nn.softmax(v, axis=-1)  # noqa: E731
        elif self.gated_function == "sigmoid":
            gate = jax.nn.sigmoid
        else:
            raise ValueError(f"{self.gated_function} is not supported.")

        tade1 = TADELayer(
            in_channels=self.in_channels,
            aux_channels=self.aux_channels,
            kernel_size=self.kernel_size,
            bias=self.bias,
            upsample_factor=1,
            upsample_mode=self.upsample_mode,
            norm=self.norm,
            name="tade1",
        )
        gated_conv1 = Conv1d(
            features=self.in_channels * 2,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            name="gated_conv1",
        )
        tade2 = TADELayer(
            in_channels=self.in_channels,
            aux_channels=self.in_channels,
            kernel_size=self.kernel_size,
            bias=self.bias,
            upsample_factor=self.upsample_factor,
            upsample_mode=self.upsample_mode,
            norm=self.norm,
            name="tade2",
        )
        gated_conv2 = Conv1d(
            features=self.in_channels * 2,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=(self.kernel_size - 1) // 2 * self.dilation,
            use_bias=self.bias,
            norm=self.norm,
            name="gated_conv2",
        )

        if collect_weights:
            # folded weight dict for the fused decode kernel
            # (ops/pallas_kernels/tade_decode.py); dummies only pin the
            # conv input widths so the param tree matches the normal path
            dummy = jnp.zeros(x.shape[:2] + (self.in_channels,), x.dtype)
            w1 = tade1(x, c, collect_weights=True)
            c1w, c1b = gated_conv1(dummy, return_params=True)
            w2 = tade2(x, dummy, collect_weights=True)
            c2w, c2b = gated_conv2(dummy, return_params=True)

            def b_or_zero(b, n):
                return b if b is not None else jnp.zeros((n,), x.dtype)

            two_c = self.in_channels * 2
            return {
                "aux1_w": w1["aux_w"],
                "aux1_b": b_or_zero(w1["aux_b"], self.in_channels),
                "g1_w": w1["g_w"], "g1_b": b_or_zero(w1["g_b"], two_c),
                "gc1_w": c1w, "gc1_b": b_or_zero(c1b, two_c),
                "aux2_w": w2["aux_w"],
                "aux2_b": b_or_zero(w2["aux_b"], self.in_channels),
                "g2_w": w2["g_w"], "g2_b": b_or_zero(w2["g_b"], two_c),
                "gc2_w": c2w, "gc2_b": b_or_zero(c2b, two_c),
                "scale": self.upsample_factor,
                "dilation": self.dilation,
            }

        residual = x
        x, c = tade1(x, c)
        x = gated_conv1(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        x = gate(xa) * jnp.tanh(xb)

        x, c = tade2(x, c)
        x = gated_conv2(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        x = gate(xa) * jnp.tanh(xb)

        return stretch_time(residual, self.upsample_factor) + x, c
