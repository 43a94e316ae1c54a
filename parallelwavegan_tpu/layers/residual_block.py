"""Residual blocks (WaveNet gated block, HiFi-GAN MRF block) in NTC layout.

Behavioral reference:
  * WaveNetResidualBlock: /root/reference/parallel_wavegan/layers/residual_block.py:43-140
  * HiFiGANResidualBlock: /root/reference/parallel_wavegan/layers/residual_block.py:143-258

TPU notes: the gated activation + conditioning add + residual scale are all
elementwise and fuse into the dilated conv under XLA; convs stay NTC so the
channel contraction lands on the MXU.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import Conv1d, get_activation

Array = jax.Array


def kaiming_normal_relu_init(fan_in: int):
    """torch kaiming_normal_(nonlinearity='relu'): N(0, sqrt(2/fan_in))."""
    std = math.sqrt(2.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def zeros_init():
    def init(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    return init


class WaveNetResidualBlock(nn.Module):
    """Gated WaveNet residual block with local conditioning.

    ``x (B,T,residual_ch), c (B,T,aux_ch) -> (residual (B,T,residual_ch),
    skip (B,T,skip_ch))``; residual output scaled by sqrt(0.5).
    """

    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    dropout: float = 0.0
    dilation: int = 1
    use_bias: bool = True
    use_causal_conv: bool = False
    norm: str | None = "weight"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, c: Array | None, *, deterministic: bool = True,
                 collect_weights: bool = False):
        if collect_weights:
            return self.collect_weights(x, c)
        from parallelwavegan_tpu.ops.pallas_kernels import pallas_backend_ok

        if (self.use_pallas and c is not None and self.use_bias
                and pallas_backend_ok()):
            return self._fused(x, c, deterministic)
        residual = x
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        kinit = kaiming_normal_relu_init(self.kernel_size * self.residual_channels)
        x = Conv1d(
            features=self.gate_channels,
            kernel_size=self.kernel_size,
            padding="causal" if self.use_causal_conv else "same",
            dilation=self.dilation,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kinit,
            bias_init=zeros_init(),
            name="conv",
        )(x)

        half = self.gate_channels // 2
        xa, xb = x[..., :half], x[..., half:]

        if c is not None:
            c = Conv1d(
                features=self.gate_channels,
                kernel_size=1,
                use_bias=False,
                norm=self.norm,
                kernel_init=kaiming_normal_relu_init(self.aux_channels),
                name="conv1x1_aux",
            )(c)
            xa = xa + c[..., :half]
            xb = xb + c[..., half:]

        x = jnp.tanh(xa) * jax.nn.sigmoid(xb)

        s = Conv1d(
            features=self.skip_channels,
            kernel_size=1,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(half),
            bias_init=zeros_init(),
            name="conv1x1_skip",
        )(x)
        x = Conv1d(
            features=self.residual_channels,
            kernel_size=1,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(half),
            bias_init=zeros_init(),
            name="conv1x1_out",
        )(x)
        x = (x + residual) * math.sqrt(0.5)
        return x, s

    def collect_weights(self, x: Array, c: Array) -> dict:
        """Effective (normalized) per-layer weights for the fused stack
        kernel, using the exact same param tree as the standard path."""
        kinit = kaiming_normal_relu_init(self.kernel_size * self.residual_channels)
        half = self.gate_channels // 2
        conv_kernel, conv_bias = Conv1d(
            features=self.gate_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kinit,
            bias_init=zeros_init(),
            name="conv",
        )(x, return_params=True)
        aux_kernel, _ = Conv1d(
            features=self.gate_channels,
            kernel_size=1,
            use_bias=False,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(self.aux_channels),
            name="conv1x1_aux",
        )(c, return_params=True)
        gated_dummy = jnp.zeros(x.shape[:2] + (half,), x.dtype)
        skip_kernel, skip_bias = Conv1d(
            features=self.skip_channels,
            kernel_size=1,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(half),
            bias_init=zeros_init(),
            name="conv1x1_skip",
        )(gated_dummy, return_params=True)
        res_kernel, res_bias = Conv1d(
            features=self.residual_channels,
            kernel_size=1,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(half),
            bias_init=zeros_init(),
            name="conv1x1_out",
        )(gated_dummy, return_params=True)
        return {
            "wconv": conv_kernel,
            "bconv": conv_bias,
            "waux": aux_kernel[0],
            "wskip": skip_kernel[0],
            "bskip": skip_bias,
            "wres": res_kernel[0],
            "bres": res_bias,
        }

    def _fused(self, x: Array, c: Array, deterministic: bool):
        """Single fused Pallas kernel over the whole block (same params)."""
        from parallelwavegan_tpu.ops.pallas_kernels.wavenet import (
            fused_gated_resblock,
        )

        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        kinit = kaiming_normal_relu_init(self.kernel_size * self.residual_channels)
        half = self.gate_channels // 2
        conv_kernel, conv_bias = Conv1d(
            features=self.gate_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kinit,
            bias_init=zeros_init(),
            name="conv",
        )(x, return_params=True)
        aux_kernel, _ = Conv1d(
            features=self.gate_channels,
            kernel_size=1,
            use_bias=False,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(self.aux_channels),
            name="conv1x1_aux",
        )(c, return_params=True)
        gated_dummy = jnp.zeros(x.shape[:2] + (half,), x.dtype)
        skip_kernel, skip_bias = Conv1d(
            features=self.skip_channels,
            kernel_size=1,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(half),
            bias_init=zeros_init(),
            name="conv1x1_skip",
        )(gated_dummy, return_params=True)
        res_kernel, res_bias = Conv1d(
            features=self.residual_channels,
            kernel_size=1,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=kaiming_normal_relu_init(half),
            bias_init=zeros_init(),
            name="conv1x1_out",
        )(gated_dummy, return_params=True)
        res, skip = fused_gated_resblock(
            x,
            c,
            conv_kernel,
            conv_bias,
            aux_kernel[0],
            skip_kernel[0],
            skip_bias,
            res_kernel[0],
            res_bias,
            self.dilation,
            self.use_causal_conv,
        )
        return res, skip


class HiFiGANResidualBlock(nn.Module):
    """HiFi-GAN MRF residual block: per dilation, act->dilated conv
    [-> act->conv] with additive residual (reference :143-258)."""

    kernel_size: int = 3
    channels: int = 512
    dilations: Sequence[int] = (1, 3, 5)
    use_bias: bool = True
    use_additional_convs: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict | None = None
    use_causal_conv: bool = False
    norm: str | None = "weight"

    @nn.compact
    def __call__(self, x: Array, *, collect_weights: bool = False):
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        if collect_weights:
            # fused-MRF path: effective kernels/biases, same param tree
            w1, b1, w2, b2 = [], [], [], []
            for i, dilation in enumerate(self.dilations):
                k, b = Conv1d(
                    features=self.channels,
                    kernel_size=self.kernel_size,
                    dilation=dilation,
                    padding="causal" if self.use_causal_conv else "same",
                    use_bias=self.use_bias,
                    norm=self.norm,
                    name=f"convs1_{i}",
                )(x, return_params=True)
                w1.append(k)
                b1.append(b)
                if self.use_additional_convs:
                    k2, bb2 = Conv1d(
                        features=self.channels,
                        kernel_size=self.kernel_size,
                        dilation=1,
                        padding="causal" if self.use_causal_conv else "same",
                        use_bias=self.use_bias,
                        norm=self.norm,
                        name=f"convs2_{i}",
                    )(x, return_params=True)
                    w2.append(k2)
                    b2.append(bb2)
            out = {
                "w1": jnp.stack(w1),
                "b1": jnp.stack(b1),
                "dilations": tuple(self.dilations),
            }
            if self.use_additional_convs:
                out["w2"] = jnp.stack(w2)
                out["b2"] = jnp.stack(b2)
            return out
        for i, dilation in enumerate(self.dilations):
            xt = act(x)
            xt = Conv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                padding="causal" if self.use_causal_conv else "same",
                use_bias=self.use_bias,
                norm=self.norm,
                name=f"convs1_{i}",
            )(xt)
            if self.use_additional_convs:
                xt = act(xt)
                xt = Conv1d(
                    features=self.channels,
                    kernel_size=self.kernel_size,
                    dilation=1,
                    padding="causal" if self.use_causal_conv else "same",
                    use_bias=self.use_bias,
                    norm=self.norm,
                    name=f"convs2_{i}",
                )(xt)
            x = x + xt
        return x
