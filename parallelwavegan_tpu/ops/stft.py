"""STFT ops for TPU: windowed DFT as ONE strided MXU convolution.

Semantics match ``torch.stft(center=True, pad_mode='reflect')`` /
``librosa.stft`` as used by the reference losses and preprocessing
(/root/reference/parallel_wavegan/losses/stft_loss.py:16-40,
 /root/reference/parallel_wavegan/bin/preprocess.py:26-89):
periodic Hann window of ``win_length`` zero-padded centered to ``fft_size``,
reflect-padded signal, magnitude clamped at ``sqrt(1e-7)`` to avoid NaNs.

Performance note (v5e, measured): the hot spot was never the FFT — it
was the BACKWARD of the framing op (XLA differentiates the patches conv
through an n x n one-hot transposed conv: 24 ms per resolution at
(16, 16384), 15x the rFFT it feeds). ``frame_signal`` therefore carries
a custom VJP that overlap-adds cotangents with O(n/hop) shifted updates;
the 6-resolution MRSTFT fwd+grad drops 111 ms -> 14 ms. A
``method="conv_dft"`` variant (windowed DFT as one strided MXU conv) is
kept for experimentation but LOSES to the fixed FFT path at every
measured size — including prime fft sizes like the sub-band 683, which
XLA's TPU FFT handles fine.
"""

from __future__ import annotations

import functools

import jax
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def frame_signal(x, frame_length: int, hop_size: int):
    """Extract overlapping frames: (B, T) -> (B, n_frames, frame_length).

    Forward lowers to a strided patch-extraction conv (fast). The
    BACKWARD is a custom overlap-add: XLA's autodiff of the patches op is
    a transposed conv through an n x n one-hot kernel — measured 24 ms
    for a (16, 16384) signal at fft 1024 on v5e, 15x the cost of the rFFT
    it feeds. The custom VJP decomposes each frame into ceil(n/hop)
    hop-sized chunks and accumulates them with static shifted adds:
    O(n/hop) dynamic-update-slices instead of the dense one-hot matmul.
    """
    return lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(frame_length,),
        window_strides=(hop_size,),
        padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
    )


def _frame_signal_fwd(x, frame_length, hop_size):
    return frame_signal(x, frame_length, hop_size), x.shape


def _frame_signal_bwd(frame_length, hop_size, x_shape, ct):
    b, t = x_shape
    n_frames = ct.shape[1]
    m = -(-frame_length // hop_size)  # chunks per frame
    ct = jnp.pad(ct, ((0, 0), (0, 0), (0, m * hop_size - frame_length)))
    chunks = ct.reshape(b, n_frames, m, hop_size)
    rows = jnp.zeros((b, n_frames + m - 1, hop_size), ct.dtype)
    for j in range(m):  # static shifts -> fused dynamic-update-slice adds
        rows = lax.dynamic_update_slice_in_dim(
            rows,
            lax.dynamic_slice_in_dim(rows, j, n_frames, axis=1)
            + chunks[:, :, j, :],
            j,
            axis=1,
        )
    grad = rows.reshape(b, (n_frames + m - 1) * hop_size)[:, :t]
    if grad.shape[1] < t:
        grad = jnp.pad(grad, ((0, 0), (0, t - grad.shape[1])))
    return (grad,)


frame_signal.defvjp(_frame_signal_fwd, _frame_signal_bwd)


@functools.lru_cache(maxsize=None)
def _windowed_dft_kernel_np(fft_size: int, win_length: int) -> np.ndarray:
    """(fft_size, 1, 2*(fft_size//2+1)) conv kernel: window * [cos | -sin]."""
    window = _hann_np(win_length)
    if fft_size != win_length:
        lpad = (fft_size - win_length) // 2
        window = np.pad(window, (lpad, fft_size - win_length - lpad))
    k = np.arange(fft_size)[:, None]
    j = np.arange(fft_size // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k * j / fft_size
    cos = window[:, None] * np.cos(ang)
    sin = -window[:, None] * np.sin(ang)  # rfft imag convention
    return np.concatenate([cos, sin], axis=1)[:, None, :].astype(np.float32)


def stft_magnitude(
    x,
    fft_size: int,
    hop_size: int,
    win_length: int,
    *,
    center: bool = True,
    eps: float = 1e-7,
    method: str | None = None,
):
    """Magnitude spectrogram of ``x`` (B, T) -> (B, n_frames, fft_size//2+1).

    ``sqrt(max(re^2 + im^2, eps))`` -- the clamp mirrors the reference's NaN
    guard (stft_loss.py:40) and keeps gradients finite at silence.

    method: "fft" (default; custom-VJP framing + batched rFFT) or
    "conv_dft" (windowed DFT as one strided conv; measured slower on TPU,
    kept for experimentation).
    """
    if center:
        p = fft_size // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    if method is None:
        method = "fft"
    if method == "conv_dft":
        kernel = jnp.asarray(_windowed_dft_kernel_np(fft_size, win_length))
        spec = lax.conv_general_dilated(
            x[:, :, None].astype(jnp.float32),
            kernel,
            window_strides=(hop_size,),
            padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
            precision=lax.Precision.HIGHEST,
        )
        nbins = fft_size // 2 + 1
        power = spec[..., :nbins] ** 2 + spec[..., nbins:] ** 2
        return jnp.sqrt(jnp.maximum(power, eps))
    window = hann_window(win_length, fft_size).astype(x.dtype)
    frames = frame_signal(x, fft_size, hop_size) * window
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.sqrt(jnp.maximum(power, eps))
