"""MelGAN model family (flax.linen, NTC layout).

Behavioral reference: /root/reference/parallel_wavegan/models/melgan.py
  * Generator: :17-257 (kernel-7 in/out convs, per-scale ConvTranspose1d +
    ``stacks`` dilated ResidualStacks, optional final Tanh; N(0, 0.02)
    official init :204-221)
  * Discriminator: :260-393 (prod(kernel_sizes) first conv, grouped
    downsample convs, per-layer feature outputs)
  * MelGANMultiScaleDiscriminator: :396-493 (N discriminators with
    AvgPool1d(4, 2, 1, count_include_pad=False) between scales)

Multi-band MelGAN is this generator with ``out_channels=4`` plus PQMF
analysis/synthesis outside the model (reference train.py:226-228,
melgan.py:255-257); see ops/pqmf.py.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.layers.convs import (
    CausalConvTranspose1d,
    Conv1d,
    ConvTranspose1d,
    get_activation,
    normal_init,
)
from parallelwavegan_tpu.layers.residual_stack import _PAD_MODES, ResidualStack

Array = jax.Array


class MelGANGenerator(nn.Module):
    """MelGAN generator: mel (B, T, in) -> wave (B, T * prod(scales), out)."""

    in_channels: int = 80
    out_channels: int = 1
    kernel_size: int = 7
    channels: int = 512
    bias: bool = True
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    pad: str = "ReflectionPad1d"
    pad_params: Any = None
    use_final_nonlinear_activation: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    use_pallas_stacks: bool = False  # fused residual-stack decode kernel
    # training path: custom_vjp fused stacks (melgan_stack_train.py) —
    # fused forward AND fused reverse kernels, grads <=2e-4 vs XLA
    use_pallas_stacks_train: bool = False
    pallas_stacks_train_tile: int = 512

    @nn.compact
    def __call__(self, c: Array) -> Array:
        assert self.channels >= int(np.prod(self.upsample_scales))
        assert self.channels % (2 ** len(self.upsample_scales)) == 0
        norm = "weight" if self.use_weight_norm else None
        kinit = normal_init(0.02)
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.2},
        )
        mode = _PAD_MODES.get(self.pad)
        if mode is None:
            raise ValueError(f"pad {self.pad!r} is not supported")
        # fused Pallas path (ops/pallas_kernels/melgan_stack.py): per
        # upsample stage, run all ``stacks`` ResidualStacks (and, on the
        # last stage, the trailing act -> out conv -> tanh) as one kernel.
        # Gated to the shapes/semantics the kernel covers; the deconvs
        # between stages stay in XLA (matmul-shaped, MXU-efficient).
        fuse_ok = (
            (self.use_pallas_stacks or self.use_pallas_stacks_train)
            and not self.use_causal_conv
            and self.nonlinear_activation == "LeakyReLU"
            and (mode != "constant"
                 or (self.pad_params or {}).get("value", 0.0) == 0.0)
        )
        slope = (self.nonlinear_activation_params
                 or {"negative_slope": 0.2}).get("negative_slope", 0.01)

        li = 0
        if not self.use_causal_conv:
            assert (self.kernel_size - 1) % 2 == 0, "even kernel size unsupported"
            p = (self.kernel_size - 1) // 2
            c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode=mode)
            c = Conv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                padding=0,
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name=f"layers_{li}",
            )(c)
        else:
            p = self.kernel_size - 1
            c = jnp.pad(c, ((0, 0), (p, 0), (0, 0)), mode=mode)
            c = Conv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                padding=0,
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name=f"layers_{li}",
            )(c)
        li += 1

        for i, scale in enumerate(self.upsample_scales):
            c = act(c)
            ch = self.channels // (2 ** (i + 1))
            if not self.use_causal_conv:
                c = ConvTranspose1d(
                    features=ch,
                    kernel_size=scale * 2,
                    stride=scale,
                    padding=scale // 2 + scale % 2,
                    output_padding=scale % 2,
                    use_bias=self.bias,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"layers_{li}",
                )(c)
            else:
                c = CausalConvTranspose1d(
                    features=ch,
                    kernel_size=scale * 2,
                    stride=scale,
                    use_bias=self.bias,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"layers_{li}",
                )(c)
            li += 1
            fuse_stage = fuse_ok and ch <= 128
            stack_weights = []
            for j in range(self.stacks):
                out = ResidualStack(
                    kernel_size=self.stack_kernel_size,
                    channels=ch,
                    dilation=self.stack_kernel_size**j,
                    bias=self.bias,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=self.nonlinear_activation_params
                    or {"negative_slope": 0.2},
                    pad=self.pad,
                    pad_params=self.pad_params,
                    use_causal_conv=self.use_causal_conv,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"layers_{li}",
                )(c, collect_weights=fuse_stage)
                li += 1
                if fuse_stage:
                    stack_weights.append(out)
                else:
                    c = out
            if fuse_stage:
                if self.use_pallas_stacks_train:
                    from parallelwavegan_tpu.ops.pallas_kernels.melgan_stack_train import (  # noqa: E501
                        fused_melgan_stacks_train,
                    )

                    fused_fn = functools.partial(
                        fused_melgan_stacks_train,
                        t_tile=self.pallas_stacks_train_tile)
                else:
                    from parallelwavegan_tpu.ops.pallas_kernels.melgan_stack import (  # noqa: E501
                        fused_melgan_stacks as fused_fn,
                    )

                final = None
                if (i == len(self.upsample_scales) - 1
                        and self.use_final_nonlinear_activation):
                    # fold the trailing act -> out conv -> tanh in too
                    final = Conv1d(
                        features=self.out_channels,
                        kernel_size=self.kernel_size,
                        padding=0,
                        use_bias=self.bias,
                        norm=norm,
                        kernel_init=kinit,
                        name=f"layers_{li}",
                    )(c, return_params=True)
                c = fused_fn(
                    c, stack_weights, final=final, slope=slope,
                    pad_mode=mode,
                )
                if final is not None:
                    return c

        c = act(c)
        if not self.use_causal_conv:
            p = (self.kernel_size - 1) // 2
            c = jnp.pad(c, ((0, 0), (p, p), (0, 0)), mode=mode)
        else:
            p = self.kernel_size - 1
            c = jnp.pad(c, ((0, 0), (p, 0), (0, 0)), mode=mode)
        c = Conv1d(
            features=self.out_channels,
            kernel_size=self.kernel_size,
            padding=0,
            use_bias=self.bias,
            norm=norm,
            kernel_init=kinit,
            name=f"layers_{li}",
        )(c)
        if self.use_final_nonlinear_activation:
            c = jnp.tanh(c)
        return c

    @property
    def upsample_factor(self) -> int:
        f = 1
        for s in self.upsample_scales:
            f *= s
        return f

    requires_noise_input = False
    requires_aux_input = True


class MelGANDiscriminator(nn.Module):
    """MelGAN discriminator: (B, T, in) -> list of per-layer features."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    bias: bool = True
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    pad: str = "ReflectionPad1d"
    pad_params: Any = None
    norm: str | None = "weight"

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        assert len(self.kernel_sizes) == 2
        assert self.kernel_sizes[0] % 2 == 1 and self.kernel_sizes[1] % 2 == 1
        kinit = normal_init(0.02)
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.2},
        )
        mode = _PAD_MODES.get(self.pad)
        if mode is None:
            raise ValueError(f"pad {self.pad!r} is not supported")
        outs = []
        li = 0

        k0 = int(np.prod(self.kernel_sizes))
        p = (k0 - 1) // 2
        x = jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode=mode)
        x = Conv1d(
            features=self.channels,
            kernel_size=k0,
            padding=0,
            use_bias=self.bias,
            norm=self.norm,
            kernel_init=kinit,
            name=f"layers_{li}",
        )(x)
        x = act(x)
        outs.append(x)
        li += 1

        in_chs = self.channels
        for scale in self.downsample_scales:
            out_chs = min(in_chs * scale, self.max_downsample_channels)
            x = Conv1d(
                features=out_chs,
                kernel_size=scale * 10 + 1,
                stride=scale,
                padding=scale * 5,
                groups=in_chs // 4,
                use_bias=self.bias,
                norm=self.norm,
                kernel_init=kinit,
                name=f"layers_{li}",
            )(x)
            x = act(x)
            outs.append(x)
            li += 1
            in_chs = out_chs

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        x = Conv1d(
            features=out_chs,
            kernel_size=self.kernel_sizes[0],
            padding=(self.kernel_sizes[0] - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            kernel_init=kinit,
            name=f"layers_{li}",
        )(x)
        x = act(x)
        outs.append(x)
        li += 1
        x = Conv1d(
            features=self.out_channels,
            kernel_size=self.kernel_sizes[1],
            padding=(self.kernel_sizes[1] - 1) // 2,
            use_bias=self.bias,
            norm=self.norm,
            kernel_init=kinit,
            name=f"layers_{li}",
        )(x)
        outs.append(x)
        return outs


def avg_pool1d(
    x: Array,
    kernel_size: int,
    stride: int,
    padding: int,
    count_include_pad: bool = True,
) -> Array:
    """torch AvgPool1d over (B, T, C)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    if count_include_pad:
        return summed / kernel_size
    counts = jax.lax.reduce_window(
        jnp.ones((1, x.shape[1], 1), x.dtype),
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    return summed / counts


class MelGANMultiScaleDiscriminator(nn.Module):
    """N MelGAN discriminators over progressively pooled audio."""

    in_channels: int = 1
    out_channels: int = 1
    scales: int = 3
    downsample_pooling: str = "AvgPool1d"
    downsample_pooling_params: Any = None
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    bias: bool = True
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    pad: str = "ReflectionPad1d"
    pad_params: Any = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        pool_params = {
            "kernel_size": 4,
            "stride": 2,
            "padding": 1,
            "count_include_pad": False,
        }
        pool_params.update(self.downsample_pooling_params or {})
        norm = "weight" if self.use_weight_norm else None
        outs = []
        for i in range(self.scales):
            outs.append(
                MelGANDiscriminator(
                    in_channels=self.in_channels,
                    out_channels=self.out_channels,
                    kernel_sizes=self.kernel_sizes,
                    channels=self.channels,
                    max_downsample_channels=self.max_downsample_channels,
                    bias=self.bias,
                    downsample_scales=self.downsample_scales,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=self.nonlinear_activation_params,
                    pad=self.pad,
                    pad_params=self.pad_params,
                    norm=norm,
                    name=f"discriminators_{i}",
                )(x)
            )
            x = avg_pool1d(x, **pool_params)
        return outs
