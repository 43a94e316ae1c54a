"""Parallel WaveGAN model family (flax.linen, NTC layout).

Behavioral reference: /root/reference/parallel_wavegan/models/parallel_wavegan.py
  * Generator: :21-261 (noise + upsampled mel through 30 dilated gated
    WaveNet blocks, skip-sum scaled by sqrt(1/L), receptive field :197-209)
  * Discriminator: :264-371 (dilated non-conditional conv stack)
  * ResidualParallelWaveGANDiscriminator: :374-513 (WaveNet-style D)

TPU design notes: the whole generator is a chain of NTC convs whose channel
contractions run on the MXU; the skip accumulation is kept as a running sum
(XLA fuses the adds into the producing 1x1 convs). Noise input is an
explicit argument; ``aux_context_window`` mel padding happens host-side or
in ``inference`` wrappers, mirroring the reference's ReplicationPad1d.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import jax

from parallelwavegan_tpu.layers.convs import Conv1d, get_activation
from parallelwavegan_tpu.layers.residual_block import (
    WaveNetResidualBlock,
    kaiming_normal_relu_init,
)
from parallelwavegan_tpu.layers.upsample import ConvInUpsampleNetwork, UpsampleNetwork

Array = jax.Array


def _build_upsample_net(upsample_net: str, upsample_params: dict, *,
                        aux_channels: int, aux_context_window: int,
                        use_causal_conv: bool, norm: str | None):
    """Map reference upsample_net config strings to modules (ref :84-108).

    ``norm`` is the PWG generator's weight norm: the reference applies it
    to every Conv1d/Conv2d including the upsample net's
    (models/parallel_wavegan.py:189-195), and for the MelGANGenerator
    upsample net it passes use_weight_norm=False only to avoid double
    application before normalizing everything itself.
    """
    params = dict(upsample_params)
    params["use_causal_conv"] = use_causal_conv
    if upsample_net == "ConvInUpsampleNetwork":
        params["aux_channels"] = aux_channels
        params["aux_context_window"] = aux_context_window
        return ConvInUpsampleNetwork(**params, norm=norm, name="upsample_net")
    if upsample_net == "UpsampleNetwork":
        return UpsampleNetwork(**params, norm=norm, name="upsample_net")
    if upsample_net == "MelGANGenerator":
        from parallelwavegan_tpu.models.melgan import MelGANGenerator

        assert aux_context_window == 0
        params["use_weight_norm"] = norm == "weight"
        params["use_final_nonlinear_activation"] = False
        return MelGANGenerator(**params, name="upsample_net")
    raise ValueError(f"upsample_net {upsample_net!r} is not supported")


class ParallelWaveGANGenerator(nn.Module):
    """PWG generator: (z (B, T, 1), c (B, T'+2w, aux)) -> (B, T, out)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    upsample_conditional_features: bool = True
    upsample_net: str = "ConvInUpsampleNetwork"
    upsample_params: Any = None
    use_pallas_kernels: bool = False
    use_pallas_stack: bool = False  # fused whole-cycle inference kernel
    pallas_stack_tile: int = 8192
    pallas_stack_bf16: bool = False
    # training-capable fused cycle (custom_vjp fwd + fused reverse kernel,
    # ops/pallas_kernels/wavenet_stack_train.py): G fwd+bwd 84 -> 63 ms and
    # the D-phase re-forward 36 -> 15 ms at PWG v1 batch 6 x 25600
    use_pallas_stack_train: bool = False
    pallas_stack_train_tile: int = 2048
    pallas_stack_train_layers_per_call: int = 5

    @nn.compact
    def __call__(self, z: Array, c: Array | None, *,
                 deterministic: bool = True) -> Array:
        assert self.layers % self.stacks == 0
        layers_per_stack = self.layers // self.stacks
        norm = "weight" if self.use_weight_norm else None

        if c is not None and self.upsample_conditional_features:
            up = _build_upsample_net(
                self.upsample_net,
                self.upsample_params or {"upsample_scales": [4, 4, 4, 4]},
                aux_channels=self.aux_channels,
                aux_context_window=self.aux_context_window,
                use_causal_conv=self.use_causal_conv,
                norm=norm,
            )
            c = up(c)
            assert c.shape[1] == z.shape[1], (c.shape, z.shape)

        x = Conv1d(
            features=self.residual_channels,
            kernel_size=1,
            use_bias=True,
            norm=norm,
            kernel_init=kaiming_normal_relu_init(self.in_channels),
            name="first_conv",
        )(z)

        blocks = [
            WaveNetResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=self.aux_channels,
                dilation=2 ** (layer % layers_per_stack),
                dropout=self.dropout,
                use_bias=self.bias,
                use_causal_conv=self.use_causal_conv,
                norm=norm,
                use_pallas=self.use_pallas_kernels,
                name=f"conv_layers_{layer}",
            )
            for layer in range(self.layers)
        ]
        from parallelwavegan_tpu.ops.pallas_kernels import pallas_backend_ok

        if (
            (self.use_pallas_stack or self.use_pallas_stack_train)
            and c is not None
            and not self.use_causal_conv
            and self.dropout == 0.0
            and pallas_backend_ok()
        ):
            # whole-cycle fused path: stack every block's effective
            # weights (identical param tree) and run one dilation cycle per
            # pallas call. The _train variant is a custom_vjp pair
            # (fwd = same kernel, bwd = fused reverse kernel) so gradients
            # flow to the (g, v) weight-norm params through jnp.stack.
            from parallelwavegan_tpu.ops.pallas_kernels.wavenet_stack import (
                fused_wavenet_cycle,
            )
            from parallelwavegan_tpu.ops.pallas_kernels.wavenet_stack_train import (  # noqa: E501
                fused_wavenet_cycle_train,
            )

            per_layer = [
                blk(x, c, collect_weights=True) for blk in blocks
            ]
            skips = 0.0
            for s in range(0, self.layers, layers_per_stack):
                e = s + layers_per_stack
                weights = {
                    k: jnp.stack([per_layer[i][k] for i in range(s, e)])
                    for k in per_layer[0]
                }
                dils = tuple(
                    2 ** (i % layers_per_stack) for i in range(s, e)
                )
                if self.use_pallas_stack_train:
                    x, sk = fused_wavenet_cycle_train(
                        x, c, weights, dils,
                        t_tile=self.pallas_stack_train_tile,
                        max_layers_per_call=(
                            self.pallas_stack_train_layers_per_call
                        ),
                    )
                else:
                    x, sk = fused_wavenet_cycle(
                        x, c, weights, dils,
                        t_tile=self.pallas_stack_tile,
                        compute_dtype=jnp.bfloat16
                        if self.pallas_stack_bf16 else jnp.float32,
                    )
                skips += sk
        else:
            skips = 0.0
            for blk in blocks:
                x, h = blk(x, c, deterministic=deterministic)
                skips += h
        skips *= math.sqrt(1.0 / self.layers)

        x = jax.nn.relu(skips)
        x = Conv1d(
            features=self.skip_channels,
            kernel_size=1,
            use_bias=True,
            norm=norm,
            kernel_init=kaiming_normal_relu_init(self.skip_channels),
            name="last_conv_1",
        )(x)
        x = jax.nn.relu(x)
        x = Conv1d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=True,
            norm=norm,
            kernel_init=kaiming_normal_relu_init(self.skip_channels),
            name="last_conv_2",
        )(x)
        return x

    @property
    def upsample_factor(self) -> int:
        if not self.upsample_conditional_features:
            return 1
        f = 1
        for s in (self.upsample_params or {"upsample_scales": [4, 4, 4, 4]})[
            "upsample_scales"
        ]:
            f *= s
        return f

    @property
    def receptive_field_size(self) -> int:
        layers_per_cycle = self.layers // self.stacks
        dilations = [2 ** (i % layers_per_cycle) for i in range(self.layers)]
        return (self.kernel_size - 1) * sum(dilations) + 1

    requires_noise_input = True
    requires_aux_input = True


class ParallelWaveGANDiscriminator(nn.Module):
    """Non-conditional dilated conv-stack D: (B, T, 1) -> (B, T, 1)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    bias: bool = True
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert (self.kernel_size - 1) % 2 == 0
        assert self.dilation_factor > 0
        norm = "weight" if self.use_weight_norm else None
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.2},
        )
        for i in range(self.layers - 1):
            dilation = (
                1
                if i == 0
                else (i if self.dilation_factor == 1 else self.dilation_factor**i)
            )
            x = Conv1d(
                features=self.conv_channels,
                kernel_size=self.kernel_size,
                dilation=dilation,
                padding=(self.kernel_size - 1) // 2 * dilation,
                use_bias=self.bias,
                norm=norm,
                kernel_init=kaiming_normal_relu_init(
                    self.kernel_size * (self.in_channels if i == 0 else self.conv_channels)
                ),
                name=f"conv_layers_{i}",
            )(x)
            x = act(x)
        x = Conv1d(
            features=self.out_channels,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=norm,
            kernel_init=kaiming_normal_relu_init(
                self.kernel_size * self.conv_channels
            ),
            name="last_conv",
        )(x)
        return x


class ResidualParallelWaveGANDiscriminator(nn.Module):
    """WaveNet-style D: unconditioned gated residual stack -> 1x1 head."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        assert (self.kernel_size - 1) % 2 == 0
        assert self.layers % self.stacks == 0
        layers_per_stack = self.layers // self.stacks
        norm = "weight" if self.use_weight_norm else None
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.2},
        )

        x = Conv1d(
            features=self.residual_channels,
            kernel_size=1,
            use_bias=True,
            norm=norm,
            kernel_init=kaiming_normal_relu_init(self.in_channels),
            name="first_conv",
        )(x)
        x = act(x)

        skips = 0.0
        for layer in range(self.layers):
            dilation = 2 ** (layer % layers_per_stack)
            x, h = WaveNetResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=-1,
                dilation=dilation,
                dropout=self.dropout,
                use_bias=self.bias,
                use_causal_conv=self.use_causal_conv,
                norm=norm,
                name=f"conv_layers_{layer}",
            )(x, None, deterministic=deterministic)
            skips += h
        skips *= math.sqrt(1.0 / self.layers)

        x = act(skips)
        x = Conv1d(
            features=self.skip_channels,
            kernel_size=1,
            use_bias=True,
            norm=norm,
            kernel_init=kaiming_normal_relu_init(self.skip_channels),
            name="last_conv_1",
        )(x)
        x = act(x)
        x = Conv1d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=True,
            norm=norm,
            kernel_init=kaiming_normal_relu_init(self.skip_channels),
            name="last_conv_2",
        )(x)
        return x
