"""MelGAN residual stack (NTC layout).

Behavioral reference:
/root/reference/parallel_wavegan/layers/residual_stack.py:13-85
(act -> pad -> dilated conv -> act -> 1x1 conv, plus a 1x1 skip conv).
All three pad modes the reference reaches by name (ReflectionPad1d,
ReplicationPad1d, ConstantPad1d) map to jnp.pad modes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import (
    Conv1d,
    get_activation,
    normal_init,
)

Array = jax.Array

_PAD_MODES = {
    "ReflectionPad1d": "reflect",
    "ReplicationPad1d": "edge",
    "ConstantPad1d": "constant",
}


class ResidualStack(nn.Module):
    """MelGAN residual stack: stack(c) + skip_conv(c)."""

    kernel_size: int = 3
    channels: int = 32
    dilation: int = 1
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    pad: str = "ReflectionPad1d"
    pad_params: Any = None
    use_causal_conv: bool = False
    norm: str | None = "weight"
    kernel_init: Any = None

    @nn.compact
    def __call__(self, c: Array, *, collect_weights: bool = False):
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.2},
        )
        kinit = self.kernel_init or normal_init(0.02)
        mode = _PAD_MODES.get(self.pad)
        if mode is None:
            raise ValueError(f"pad {self.pad!r} is not supported")
        pad_kwargs = {}
        if mode == "constant":
            pad_kwargs["constant_values"] = (self.pad_params or {}).get("value", 0.0)

        if collect_weights:
            # fused-kernel path (ops/pallas_kernels/melgan_stack.py): expose
            # the effective (normalized) weights without running the convs;
            # the flax param tree stays identical to the compute path.
            wd, bd = Conv1d(
                features=self.channels, kernel_size=self.kernel_size,
                dilation=self.dilation, padding=0, use_bias=self.bias,
                norm=self.norm, kernel_init=kinit, name="conv_dilated",
            )(c, return_params=True)
            w1, b1 = Conv1d(
                features=self.channels, kernel_size=1, use_bias=self.bias,
                norm=self.norm, kernel_init=kinit, name="conv_1x1",
            )(c, return_params=True)
            ws, bs = Conv1d(
                features=self.channels, kernel_size=1, use_bias=self.bias,
                norm=self.norm, kernel_init=kinit, name="skip_conv",
            )(c, return_params=True)
            return {"wd": wd, "bd": bd, "w1": w1, "b1": b1,
                    "ws": ws, "bs": bs, "dilation": self.dilation}

        x = act(c)
        if not self.use_causal_conv:
            assert (self.kernel_size - 1) % 2 == 0, "even kernel size unsupported"
            p = (self.kernel_size - 1) // 2 * self.dilation
            x = jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode=mode, **pad_kwargs)
        else:
            p = (self.kernel_size - 1) * self.dilation
            x = jnp.pad(x, ((0, 0), (p, 0), (0, 0)), mode=mode, **pad_kwargs)
        x = Conv1d(
            features=self.channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=0,
            use_bias=self.bias,
            norm=self.norm,
            kernel_init=kinit,
            name="conv_dilated",
        )(x)
        x = act(x)
        x = Conv1d(
            features=self.channels,
            kernel_size=1,
            use_bias=self.bias,
            norm=self.norm,
            kernel_init=kinit,
            name="conv_1x1",
        )(x)
        skip = Conv1d(
            features=self.channels,
            kernel_size=1,
            use_bias=self.bias,
            norm=self.norm,
            kernel_init=kinit,
            name="skip_conv",
        )(c)
        return x + skip
