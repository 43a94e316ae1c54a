"""U-Net HiFi-GAN generator (flax.linen, NTC layout).

Behavioral reference: /root/reference/parallel_wavegan/models/uhifigan.py
(:19-300): sine-excitation waveform runs down an MRF + strided-conv
encoder (channel-doubling per scale), the mel enters at the bottleneck via
``hidden_conv``, and skip connections concatenate on the way up through
ConvTranspose + MRF blocks; output conv + tanh. N(0, 0.01) init, weight
norm on all convs.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import (
    CausalConv1d,
    CausalConvTranspose1d,
    Conv1d,
    ConvTranspose1d,
    get_activation,
    normal_init,
)
from parallelwavegan_tpu.layers.residual_block import HiFiGANResidualBlock

Array = jax.Array


class UHiFiGANGenerator(nn.Module):
    """U-Net HiFiGAN: (excitation (B, T, 1), mel (B, T', in)) -> (B, T, out)."""

    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    downsample_scales: Sequence[int] = (8, 8, 2, 2)
    downsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    dropout: float = 0.3
    use_additional_convs: bool = True
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, excitation: Array, c: Array, *,
                 deterministic: bool = True) -> Array:
        assert self.kernel_size % 2 == 1
        norm = "weight" if self.use_weight_norm else None
        kinit = normal_init(0.01)
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        num_blocks = len(self.resblock_kernel_sizes)
        drop = nn.Dropout(rate=self.dropout, deterministic=deterministic)

        def mrf(x, channels, name_prefix, i):
            cs = 0.0
            for j in range(num_blocks):
                cs += HiFiGANResidualBlock(
                    kernel_size=self.resblock_kernel_sizes[j],
                    channels=channels,
                    dilations=self.resblock_dilations[j],
                    use_bias=self.bias,
                    use_additional_convs=self.use_additional_convs,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=self.nonlinear_activation_params
                    or {"negative_slope": 0.1},
                    use_causal_conv=self.use_causal_conv,
                    norm=norm,
                    name=f"{name_prefix}_{i * num_blocks + j}",
                )(x)
            return cs / num_blocks

        # --- encoder over the excitation -------------------------------
        ch = self.channels
        if self.use_causal_conv:
            hidden = CausalConv1d(
                features=ch, kernel_size=self.kernel_size, use_bias=self.bias,
                norm=norm, kernel_init=kinit, name="input_conv",
            )(excitation)
        else:
            hidden = Conv1d(
                features=ch, kernel_size=self.kernel_size, padding="same",
                use_bias=self.bias, norm=norm, kernel_init=kinit,
                name="input_conv",
            )(excitation)
        hidden = drop(act(hidden))

        skips = []
        for i, scale in enumerate(self.downsample_scales):
            hidden = mrf(hidden, ch, "downsamples_mrf", i)
            pad = scale // 2 + scale % 2
            hidden = Conv1d(
                features=ch * 2,
                kernel_size=self.downsample_kernel_sizes[i],
                stride=scale,
                padding="causal" if self.use_causal_conv else pad,
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name=f"downsamples_{i}",
            )(hidden)
            hidden = drop(act(hidden))
            ch *= 2
            skips.append(hidden)
        skips.reverse()

        # --- bottleneck: mel enters ------------------------------------
        if self.use_causal_conv:
            x = CausalConv1d(
                features=ch, kernel_size=self.kernel_size, use_bias=self.bias,
                norm=norm, kernel_init=kinit, name="hidden_conv",
            )(c)
        else:
            x = Conv1d(
                features=ch, kernel_size=self.kernel_size, padding="same",
                use_bias=self.bias, norm=norm, kernel_init=kinit,
                name="hidden_conv",
            )(c)

        # --- decoder with skip concats ---------------------------------
        for i, scale in enumerate(self.upsample_scales):
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = act(x)
            if self.use_causal_conv:
                x = CausalConvTranspose1d(
                    features=ch // 2,
                    kernel_size=self.upsample_kernel_sizes[i],
                    stride=scale,
                    use_bias=self.bias,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"upsamples_{i}",
                )(x)
            else:
                x = ConvTranspose1d(
                    features=ch // 2,
                    kernel_size=self.upsample_kernel_sizes[i],
                    stride=scale,
                    padding=scale // 2 + scale % 2,
                    output_padding=scale % 2,
                    use_bias=self.bias,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"upsamples_{i}",
                )(x)
            x = mrf(x, ch // 2, "upsamples_mrf", i)
            ch //= 2

        x = get_activation("LeakyReLU", {"negative_slope": 0.01})(x)
        if self.use_causal_conv:
            x = CausalConv1d(
                features=self.out_channels, kernel_size=self.kernel_size,
                use_bias=self.bias, norm=norm, kernel_init=kinit,
                name="output_conv",
            )(x)
        else:
            x = Conv1d(
                features=self.out_channels, kernel_size=self.kernel_size,
                padding="same", use_bias=self.bias, norm=norm,
                kernel_init=kinit, name="output_conv",
            )(x)
        return jnp.tanh(x)

    requires_noise_input = False
    requires_aux_input = True
