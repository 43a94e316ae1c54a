"""1-D convolution primitives in NTC layout.

Pure functions over explicit kernels, built on ``lax.conv_general_dilated``
so XLA can tile them onto the TPU MXU. Kernels are stored in gather form
``(K, C_in // groups, C_out)`` (dimension numbers ``('NTC','TIO','NTC')``);
transposed convolutions take the *same* gather-form kernel and are realized
as input-dilated convolutions, which XLA lowers to a single MXU-friendly op.

Behavioral reference (semantics only, re-derived for NTC):
  * torch.nn.Conv1d / ConvTranspose1d length math as used throughout
    /root/reference/parallel_wavegan/models/*.py
  * causal variants: /root/reference/parallel_wavegan/layers/causal_conv.py:12-78
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Grouped convs with narrow per-group input blocks are lowered as
# block-diagonal DENSE convs on TPU: XLA's grouped-conv lowering
# degenerates to tiny per-group contractions that cannot tile the
# 128x128 MXU. Measured on v5e (MelGAN-D downsample shapes, k=41 s=4,
# Cin/groups == 4): groups=4 grouped 14.7 TF/s -> dense 3.8x faster;
# groups=16 grouped 0.86 TF/s -> dense 1.2x; groups=64 dense LOSES
# (0.6x) because the `groups`-fold FLOP inflation of the mostly-zero
# dense kernel overtakes the tiling win. Hence BOTH caps below. Wider
# per-group blocks (HiFi-GAN scale D, Cin/groups >= 32) already tile
# fine — those stay grouped. Gradients are exact: the dense kernel is
# an einsum scatter of the grouped parameters, so autodiff gathers the
# block-diagonal of the dense gradient back out.
_DENSE_GROUPS_MAX_BLOCK = 8
_DENSE_GROUPS_MAX_GROUPS = 16


def _block_diag_kernel(kernel, groups: int):
    """(K, cig, Cout) grouped kernel -> (K, cig*groups, Cout) dense."""
    k, cig, co = kernel.shape
    cog = co // groups
    kr = kernel.reshape(k, cig, groups, cog)  # [k, i, h, o]
    eye = jnp.eye(groups, dtype=kernel.dtype)
    wd = jnp.einsum("kiho,gh->kgiho", kr, eye)
    return wd.reshape(k, cig * groups, co)


def conv1d(
    x,
    kernel,
    bias=None,
    *,
    stride: int = 1,
    padding=0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
    dense_groups: bool | None = None,
):
    """1-D convolution.

    Args:
        x: Input ``(B, T, C_in)``.
        kernel: Gather-form kernel ``(K, C_in // groups, C_out)``.
        bias: Optional ``(C_out,)``.
        stride: Window stride.
        padding: int (symmetric) or ``(left, right)`` pair of zero padding.
        dilation: Kernel (rhs) dilation.
        groups: Feature group count.
        dense_groups: Lower a grouped conv as a block-diagonal dense conv
            (numerically identical, MXU-friendly for tiny groups). None =
            auto: on TPU when ``C_in // groups <= 8``.

    Returns:
        ``(B, T_out, C_out)`` with
        ``T_out = (T + pad_l + pad_r - dilation*(K-1) - 1) // stride + 1``.
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    if groups > 1:
        if dense_groups is None:
            dense_groups = (
                kernel.shape[1] <= _DENSE_GROUPS_MAX_BLOCK
                and groups <= _DENSE_GROUPS_MAX_GROUPS
                and jax.default_backend() == "tpu"
            )
        if dense_groups:
            kernel = _block_diag_kernel(kernel, groups)
            groups = 1
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[tuple(padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose1d(
    x,
    kernel,
    bias=None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    precision=None,
):
    """1-D transposed convolution with torch ConvTranspose1d length math.

    The kernel is in gather form ``(K, C_in, C_out)``: this function computes
    the scatter/transposed convolution as a convolution over the
    input dilated by ``stride``, i.e.

        ``y[t] = sum_k xd[t - (K-1) + padding + k] . kernel[k]``

    which XLA fuses into one op (no explicit dilated intermediate).

    Returns:
        ``(B, (T-1)*stride - 2*padding + K + output_padding, C_out)``.
    """
    k = kernel.shape[0]
    pad_l = k - 1 - padding
    pad_r = k - 1 - padding + output_padding
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(stride,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def causal_conv1d_pad(x, kernel_size: int, dilation: int = 1, pad_value: float = 0.0):
    """Left-pad ``x`` by ``(kernel_size - 1) * dilation`` along time.

    With a subsequent VALID conv this yields a causal convolution whose
    output length equals the input length (the reference pads both sides
    then trims to input length, which is equivalent;
    causal_conv.py:28-42 in the reference).
    """
    pad = (kernel_size - 1) * dilation
    if pad == 0:
        return x
    return jnp.pad(
        x, ((0, 0), (pad, 0), (0, 0)), mode="constant", constant_values=pad_value
    )


def causal_conv_transpose1d(
    x,
    kernel,
    bias=None,
    *,
    stride: int = 1,
    precision=None,
):
    """Causal transposed convolution.

    Matches the reference recipe (causal_conv.py:45-78): replication-pad one
    frame on the left, full transposed conv (padding 0), then trim ``stride``
    samples from both ends -> output length ``T * stride + K - 2 * stride``
    (``= T * stride`` for the usual ``K == 2 * stride``).
    """
    x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="edge")
    y = conv_transpose1d(x, kernel, bias, stride=stride, precision=precision)
    return y[:, stride:-stride, :]
