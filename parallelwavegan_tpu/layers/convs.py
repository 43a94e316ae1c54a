"""Normalized 1-D/2-D conv modules (flax.linen, NTC / NHWC layout).

Weight norm is an explicit (g, v) parameterization identical in math to
``torch.nn.utils.weight_norm`` (norm per output channel for Conv, per input
channel for ConvTranspose -- torch's default dim=0 on its native layouts),
so reference checkpoints map 1:1 onto these params. Spectral norm keeps its
power-iteration vector in a ``spectral`` variable collection, updated only
when that collection is mutable (i.e. during train steps).

Behavioral reference: weight-norm application sites throughout
/root/reference/parallel_wavegan/models/*.py; causal conv semantics from
/root/reference/parallel_wavegan/layers/causal_conv.py:12-78.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.ops.conv import (
    causal_conv1d_pad,
    conv1d,
    conv_transpose1d,
)

Array = jax.Array


def leaky_relu(x, negative_slope: float = 0.1):
    return jnp.where(x >= 0, x, negative_slope * x)


def get_activation(name: str, params: dict | None = None) -> Callable[[Array], Array]:
    """Map reference activation config strings to functions."""
    params = params or {}
    if name == "LeakyReLU":
        slope = params.get("negative_slope", 0.01)
        return lambda x: leaky_relu(x, slope)
    if name == "ReLU":
        return jax.nn.relu
    if name == "Tanh":
        return jnp.tanh
    if name == "GELU":
        return jax.nn.gelu
    if name == "SELU":
        return jax.nn.selu
    if name == "ELU":
        return jax.nn.elu
    if name == "Softplus":
        return jax.nn.softplus
    raise ValueError(f"activation {name!r} is not supported")


def torch_conv_init(fan_in: int):
    """torch Conv default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal_init(stddev: float):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


def _l2norm_keep(v: Array, axes: Sequence[int]) -> Array:
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(axes), keepdims=True))


class _NormalizedKernel(nn.Module):
    """Mixin-style helper creating a (possibly normalized) kernel param.

    norm: None | 'weight' | 'spectral'.
    ``wn_axes``: axes of the kernel reduced by the weight norm; the
    complementary axis indexes the norm groups (out-channels for Conv,
    in-channels for ConvTranspose).
    """

    def _make_kernel(
        self,
        shape: tuple,
        norm: str | None,
        wn_axes: Sequence[int],
        kernel_init,
        sn_perm: Sequence[int] = (2, 1, 0),
    ) -> Array:
        if norm is None:
            return self.param("kernel", kernel_init, shape)
        if norm == "weight":
            v = self.param("v", kernel_init, shape)
            g_shape = tuple(
                1 if a in tuple(wn_axes) else s for a, s in enumerate(shape)
            )
            g = self.param(
                "g", lambda rng: jnp.reshape(_l2norm_keep(v, wn_axes), g_shape)
            )
            return g * v / (_l2norm_keep(v, wn_axes) + 1e-12)
        if norm == "spectral":
            # torch.nn.utils.spectral_norm semantics: persistent (u, v)
            # estimates; one power iteration per *training* forward, none in
            # eval; sigma = u^T W v with u, v as constants (gradient flows
            # through W only).
            kernel = self.param("kernel", kernel_init, shape)
            # torch reshapes its native-layout weight to (dim0, -1); sn_perm
            # reorders our kernel into that exact layout so the stored
            # (u, v) vectors stay index-compatible with torch checkpoints
            w = jnp.transpose(kernel, tuple(sn_perm))
            w_mat = w.reshape(w.shape[0], -1)

            # init with one power iteration from a fixed random start:
            # independent random (u, v) would give sigma = u^T W v ~ 0 and a
            # catastrophically mis-scaled D at step 1 (torch's first train
            # forward runs the same iteration before using sigma)
            w0 = jax.lax.stop_gradient(w_mat)

            def _normalize(vec):
                return vec / (jnp.linalg.norm(vec) + 1e-12)

            def _u0():
                return _normalize(
                    jax.random.normal(jax.random.key(w_mat.shape[1]),
                                      (w_mat.shape[0],))
                )

            u_var = self.variable(
                "spectral", "u", lambda: _normalize(w0 @ _normalize(w0.T @ _u0()))
            )
            v_var = self.variable(
                "spectral", "v", lambda: _normalize(w0.T @ _u0())
            )
            u = jax.lax.stop_gradient(u_var.value)
            v = jax.lax.stop_gradient(v_var.value)
            train = (
                self.is_mutable_collection("spectral")
                and not self.is_initializing()
            )
            if train:
                wm = jax.lax.stop_gradient(w_mat)
                v = wm.T @ u
                v = v / (jnp.linalg.norm(v) + 1e-12)
                u = wm @ v
                u = u / (jnp.linalg.norm(u) + 1e-12)
                u_var.value = u
                v_var.value = v
            sigma = jnp.dot(u, w_mat @ v)
            # the stored (u, v) stay f32 even under bf16 mixed precision,
            # so divide would promote — keep the weight in the kernel dtype
            return (kernel / (sigma + 1e-12)).astype(kernel.dtype)
        raise ValueError(f"unknown norm {norm!r}")


class Conv1d(_NormalizedKernel):
    """1-D conv, kernel (K, Cin//groups, Cout), input (B, T, Cin)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Any = 0  # int | (l, r) | 'same' | 'causal'
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    norm: str | None = "weight"
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: Array, *, return_params: bool = False):
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = shape[0] * shape[1]
        kinit = self.kernel_init or torch_conv_init(fan_in)
        kernel = self._make_kernel(shape, self.norm, (0, 1), kinit)
        if return_params:
            # fused-kernel path: expose the effective (normalized) kernel
            # and bias without running the conv (same param tree)
            bias = None
            if self.use_bias:
                binit = self.bias_init or torch_conv_init(fan_in)
                bias = self.param("bias", binit, (self.features,))
            return kernel, bias
        padding = self.padding
        if padding == "same":
            padding = (self.kernel_size - 1) // 2 * self.dilation
        elif padding == "causal":
            x = causal_conv1d_pad(x, self.kernel_size, self.dilation)
            padding = 0
        bias = None
        if self.use_bias:
            binit = self.bias_init or torch_conv_init(fan_in)
            bias = self.param("bias", binit, (self.features,))
        return conv1d(
            x,
            kernel,
            bias,
            stride=self.stride,
            padding=padding,
            dilation=self.dilation,
            groups=self.groups,
        )


class ConvTranspose1d(_NormalizedKernel):
    """1-D transposed conv with torch length math; kernel (K, Cin, Cout)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    norm: str | None = "weight"
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: Array, *, return_params: bool = False):
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch, self.features)
        fan_in = self.kernel_size * in_ch  # torch fan_in for transpose conv
        kinit = self.kernel_init or torch_conv_init(fan_in)
        # torch weight-norms ConvTranspose per *input* channel (dim 0 of its
        # (Cin, Cout, K) layout) -> reduce K and Cout axes here.
        # torch spectral-norm also reshapes with dim0 = Cin.
        kernel = self._make_kernel(
            shape, self.norm, (0, 2), kinit, sn_perm=(1, 2, 0)
        )
        bias = None
        if self.use_bias:
            binit = self.bias_init or torch_conv_init(fan_in)
            bias = self.param("bias", binit, (self.features,))
        if return_params:
            # fused-kernel path: effective (normalized) kernel + bias
            return kernel, bias
        return conv_transpose1d(
            x,
            kernel,
            bias,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class CausalConv1d(nn.Module):
    """Causal conv: left-pad (K-1)*d then VALID conv; output length == input.

    Reference: causal_conv.py:12-42 (pads both sides + trim, equivalent).
    """

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    norm: str | None = "weight"
    kernel_init: Callable | None = None
    pad_value: float = 0.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = causal_conv1d_pad(x, self.kernel_size, self.dilation, self.pad_value)
        return Conv1d(
            features=self.features,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=0,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class CausalConvTranspose1d(nn.Module):
    """Causal transposed conv (causal_conv.py:45-78 semantics).

    Replication-pad 1 frame left -> full deconv -> trim ``stride`` both ends.
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    norm: str | None = "weight"
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="edge")
        y = ConvTranspose1d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            use_bias=self.use_bias,
            norm=self.norm,
            kernel_init=self.kernel_init,
            name="deconv",
        )(x)
        return y[:, self.stride : -self.stride, :]


class Conv2dP(_NormalizedKernel):
    """2-D conv in NHWC for the period discriminators; kernel (Kh, Kw, Cin, Cout)."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    use_bias: bool = True
    norm: str | None = "weight"
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        shape = (kh, kw, in_ch, self.features)
        fan_in = kh * kw * in_ch
        kinit = self.kernel_init or torch_conv_init(fan_in)
        kernel = self._make_kernel(
            shape, self.norm, (0, 1, 2), kinit, sn_perm=(3, 2, 0, 1)
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            binit = self.bias_init if hasattr(self, "bias_init") else None
            bias = self.param("bias", binit or torch_conv_init(fan_in), (self.features,))
            y = y + bias
        return y
