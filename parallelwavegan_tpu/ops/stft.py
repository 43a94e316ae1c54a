"""STFT ops for TPU: framing via XLA patch-extraction + batched rFFT.

Semantics match ``torch.stft(center=True, pad_mode='reflect')`` /
``librosa.stft`` as used by the reference losses and preprocessing
(/root/reference/parallel_wavegan/losses/stft_loss.py:16-40,
 /root/reference/parallel_wavegan/bin/preprocess.py:26-89):
periodic Hann window of ``win_length`` zero-padded centered to ``fft_size``,
reflect-padded signal, magnitude clamped at ``sqrt(1e-7)`` to avoid NaNs.

Framing uses ``lax.conv_general_dilated_patches`` so XLA lowers it as a
strided convolution read (no gather), then one batched ``jnp.fft.rfft``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _hann_np(win_length: int) -> np.ndarray:
    # Periodic Hann (torch.hann_window / scipy fftbins=True convention).
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def hann_window(win_length: int, fft_size: int | None = None) -> jnp.ndarray:
    """Periodic Hann window, optionally zero-padded centered to fft_size."""
    w = _hann_np(win_length)
    if fft_size is not None and fft_size != win_length:
        lpad = (fft_size - win_length) // 2
        w = np.pad(w, (lpad, fft_size - win_length - lpad))
    return jnp.asarray(w)


def frame_signal(x, frame_length: int, hop_size: int):
    """Extract overlapping frames: (B, T) -> (B, n_frames, frame_length)."""
    patches = lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(frame_length,),
        window_strides=(hop_size,),
        padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return patches


def stft_magnitude(
    x,
    fft_size: int,
    hop_size: int,
    win_length: int,
    *,
    center: bool = True,
    eps: float = 1e-7,
):
    """Magnitude spectrogram of ``x`` (B, T) -> (B, n_frames, fft_size//2+1).

    ``sqrt(max(re^2 + im^2, eps))`` -- the clamp mirrors the reference's NaN
    guard (stft_loss.py:40) and keeps gradients finite at silence.
    """
    if center:
        p = fft_size // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    window = hann_window(win_length, fft_size).astype(x.dtype)
    frames = frame_signal(x, fft_size, hop_size) * window
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.maximum(power, eps))
