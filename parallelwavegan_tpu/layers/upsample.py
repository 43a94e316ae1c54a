"""Mel upsampling networks for the Parallel WaveGAN generator (NTC layout).

Behavioral reference: /root/reference/parallel_wavegan/layers/upsample.py
(Stretch2d :16-46, 1/k-init Conv2d :49-59, UpsampleNetwork :62-129,
ConvInUpsampleNetwork :131-194).

TPU design: the reference treats the mel (B, C, T) as a 1-channel image
and runs 2-D convs over (freq, time). Here the same math runs in NTC:
nearest-neighbor stretch is ``jnp.repeat`` on the time axis (XLA lowers it
as a broadcast-reshape, no gather) and the (freq_k, 2*scale+1) image conv
is an NHWC conv with H=time, W=freq and a single in/out channel, which XLA
fuses with the surrounding elementwise ops.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import Conv1d, get_activation
from parallelwavegan_tpu.layers.residual_block import kaiming_normal_relu_init

Array = jax.Array


def stretch_time(x: Array, scale: int) -> Array:
    """Nearest-neighbor upsampling along time: (B, T, C) -> (B, T*scale, C)."""
    if scale == 1:
        return x
    b, t, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, t, scale, c)).reshape(
        b, t * scale, c
    )


def ones_like_mean_init(kernel_size_prod: int):
    """Reference Conv2d init: every tap = 1 / prod(kernel_size) (upsample.py:55-59)."""

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, 1.0 / kernel_size_prod, dtype)

    return init


class UpsampleNetwork(nn.Module):
    """Per-scale stretch + smoothing conv: (B, T, C) -> (B, T*prod(scales), C).

    The smoothing conv is a bias-free Conv2d with 1/k init; inside the PWG
    generator it carries weight norm like every other conv (the reference's
    apply_weight_norm hits Conv2d too, models/parallel_wavegan.py:189-195),
    hence the optional (g, v) parameterization here.
    """

    upsample_scales: Sequence[int]
    nonlinear_activation: str | None = None
    nonlinear_activation_params: Any = None
    interpolate_mode: str = "nearest"
    freq_axis_kernel_size: int = 1
    use_causal_conv: bool = False
    norm: str | None = None

    @nn.compact
    def __call__(self, c: Array) -> Array:
        if self.interpolate_mode != "nearest":
            raise ValueError("only nearest interpolation is supported")
        assert (self.freq_axis_kernel_size - 1) % 2 == 0
        fpad = (self.freq_axis_kernel_size - 1) // 2
        act = None
        if self.nonlinear_activation is not None:
            act = get_activation(
                self.nonlinear_activation, self.nonlinear_activation_params or {}
            )
        for i, scale in enumerate(self.upsample_scales):
            c = stretch_time(c, scale)
            tk = scale * 2 + 1
            shape = (tk, self.freq_axis_kernel_size, 1, 1)
            kinit = ones_like_mean_init(self.freq_axis_kernel_size * tk)
            if self.norm == "weight":
                # torch WN dim=0 = out-channel = last axis of our HWIO kernel
                v = self.param(f"conv_{i}_v", kinit, shape)
                norm_v = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2),
                                          keepdims=True))
                g = self.param(f"conv_{i}_g", lambda rng: norm_v)
                kernel = g * v / (norm_v + 1e-12)
            else:
                kernel = self.param(f"conv_{i}", kinit, shape)
            if self.use_causal_conv:
                # reference pads 2*scale both sides then trims the tail to
                # the input length == left-pad 2*scale, right-pad 0
                tpad = (scale * 2, 0)
            else:
                tpad = (scale, scale)
            if self.freq_axis_kernel_size == 1:
                # the (time_k, 1) image conv is a depthwise 1-D conv shared
                # across mel bins — ~10x faster on TPU than the NHWC form
                n_mels = c.shape[-1]
                dw = jnp.broadcast_to(kernel[:, 0, 0, :], (tk, n_mels))
                c = jax.lax.conv_general_dilated(
                    c,
                    dw[:, None, :],  # (K, 1, C) gather form, groups = C
                    window_strides=(1,),
                    padding=[tpad],
                    dimension_numbers=("NTC", "TIO", "NTC"),
                    feature_group_count=n_mels,
                )
            else:
                # (B, T, C) as NHWC image (H=time, W=freq, 1 channel)
                c = jax.lax.conv_general_dilated(
                    c[..., None],
                    kernel,
                    window_strides=(1, 1),
                    padding=[tpad, (fpad, fpad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )[..., 0]
            if act is not None:
                c = act(c)
        return c


class ConvInUpsampleNetwork(nn.Module):
    """Context conv over pre-padded mel + UpsampleNetwork (upsample.py:131-194).

    Input (B, T' + 2*aux_context_window, C) -> (B, T'*prod(scales), C); the
    context conv is VALID (the collater / inference path pre-pads the mel by
    ``aux_context_window`` frames).
    """

    upsample_scales: Sequence[int]
    nonlinear_activation: str | None = None
    nonlinear_activation_params: Any = None
    interpolate_mode: str = "nearest"
    freq_axis_kernel_size: int = 1
    aux_channels: int = 80
    aux_context_window: int = 0
    use_causal_conv: bool = False
    norm: str | None = None

    @nn.compact
    def __call__(self, c: Array) -> Array:
        kernel_size = (
            self.aux_context_window + 1
            if self.use_causal_conv
            else 2 * self.aux_context_window + 1
        )
        c = Conv1d(
            features=self.aux_channels,
            kernel_size=kernel_size,
            padding=0,
            use_bias=False,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(kernel_size * self.aux_channels),
            name="conv_in",
        )(c)
        if self.use_causal_conv and self.aux_context_window > 0:
            c = c[:, : -self.aux_context_window, :]
        return UpsampleNetwork(
            upsample_scales=self.upsample_scales,
            nonlinear_activation=self.nonlinear_activation,
            nonlinear_activation_params=self.nonlinear_activation_params,
            interpolate_mode=self.interpolate_mode,
            freq_axis_kernel_size=self.freq_axis_kernel_size,
            use_causal_conv=self.use_causal_conv,
            norm=self.norm,
            name="upsample",
        )(c)
