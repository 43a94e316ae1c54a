"""FastSpeech-style duration stack: predictor, variance predictor, length
regulator, dim-generic LayerNorm.

Behavioral reference:
  * DurationPredictor: /root/reference/parallel_wavegan/layers/duration_predictor.py:17-116
    (conv->ReLU->LayerNorm->dropout stack, linear head; log-domain in
    forward, round(exp(.) - offset) clamped at 0 in inference)
  * LengthRegulator: /root/reference/parallel_wavegan/layers/length_regulator.py:17-98
    (repeat-by-duration + pad_list)
  * LayerNorm(dim): /root/reference/parallel_wavegan/layers/layer_norm.py:10-40
  * VariancePredictor: /root/reference/parallel_wavegan/layers/variance_predictor.py:15-87

TPU design: the length regulator is re-designed as a *fixed-output-length*
gather -- ``out[t] = x[searchsorted(cumsum(d), t)]`` -- so it jits with
static shapes (the reference's repeat_interleave + pad_list is dynamic).
The jittable form drives training (teacher-forced total length is known);
``repeat_by_durations_np`` is the host-side variant for inference CLIs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.layers.convs import Conv1d, torch_conv_init

Array = jax.Array


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm(eps=1e-12) over the channel (last) axis of NTC."""

    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", lambda k, s: jnp.ones(s), (self.features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class DurationPredictor(nn.Module):
    """Per-frame duration predictor (log domain in training)."""

    idim: int
    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0

    @nn.compact
    def _net(self, xs: Array, deterministic: bool) -> Array:
        for i in range(self.n_layers):
            xs = Conv1d(
                features=self.n_chans,
                kernel_size=self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                norm=None,
                name=f"conv_{i}",
            )(xs)
            xs = jax.nn.relu(xs)
            xs = LayerNorm(self.n_chans, name=f"norm_{i}")(xs)
            xs = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(xs)
        w = self.param(
            "linear_kernel", torch_conv_init(self.n_chans), (self.n_chans, 1)
        )
        b = self.param("linear_bias", torch_conv_init(self.n_chans), (1,))
        return (xs @ w + b)[..., 0]  # (B, T)

    def __call__(
        self, xs: Array, x_masks: Array | None = None, *, deterministic: bool = True
    ) -> Array:
        """Log-domain durations (B, T); masked positions zeroed."""
        out = self._net(xs, deterministic)
        if x_masks is not None:
            out = jnp.where(x_masks, 0.0, out)
        return out

    def inference(self, xs: Array, x_masks: Array | None = None) -> Array:
        """Linear-domain integer durations: clamp(round(exp(out) - offset), 0)."""
        out = self._net(xs, True)
        out = jnp.maximum(jnp.round(jnp.exp(out) - self.offset), 0.0).astype(
            jnp.int32
        )
        if x_masks is not None:
            out = jnp.where(x_masks, 0, out)
        return out


class VariancePredictor(nn.Module):
    """FastSpeech2 variance predictor: (B, T, idim) -> (B, T, 1)."""

    idim: int
    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    bias: bool = True
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self, xs: Array, x_masks: Array | None = None, *, deterministic: bool = True
    ) -> Array:
        for i in range(self.n_layers):
            xs = Conv1d(
                features=self.n_chans,
                kernel_size=self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                use_bias=self.bias,
                norm=None,
                name=f"conv_{i}",
            )(xs)
            xs = jax.nn.relu(xs)
            xs = LayerNorm(self.n_chans, name=f"norm_{i}")(xs)
            xs = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(xs)
        w = self.param(
            "linear_kernel", torch_conv_init(self.n_chans), (self.n_chans, 1)
        )
        b = self.param("linear_bias", torch_conv_init(self.n_chans), (1,))
        xs = xs @ w + b
        if x_masks is not None:
            xs = jnp.where(x_masks[..., None], 0.0, xs)
        return xs


def length_regulator(xs: Array, ds: Array, out_length: int) -> Array:
    """Expand (B, Tin, D) by integer durations (B, Tin) to (B, out_length, D).

    Static-shape gather formulation: output position t takes input index
    ``sum(cumsum(ds) <= t)``; positions past sum(ds) repeat the final frame
    (they correspond to the reference's zero padding and must be masked or
    cropped by the caller).
    """
    cum = jnp.cumsum(ds, axis=1)  # (B, Tin)
    t = jnp.arange(out_length)  # (Tout,)
    idx = jnp.sum(cum[:, None, :] <= t[None, :, None], axis=-1)  # (B, Tout)
    idx = jnp.minimum(idx, xs.shape[1] - 1)
    return jnp.take_along_axis(xs, idx[..., None], axis=1)


def repeat_by_durations_np(x: np.ndarray, d: np.ndarray, alpha: float = 1.0):
    """Host-side repeat-by-duration for inference (length_regulator.py:80-98)."""
    if alpha != 1.0:
        assert alpha > 0
        d = np.round(d.astype(np.float64) * alpha).astype(np.int64)
    d = np.maximum(d.astype(np.int64), 0)
    if d.sum() == 0:
        d = d.copy()
        d[0] = 1
    return np.repeat(x, d, axis=0)
