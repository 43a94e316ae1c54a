"""Mel-spectrogram loss (JAX), numerically pinned to the numpy extractor.

Behavioral reference: /root/reference/parallel_wavegan/losses/mel_loss.py
(:15-110 MelSpectrogram with amplitude clamp at sqrt(eps) pre-mel and eps
clamp post-mel, :113-165 L1 loss). The mel matrix comes from the same
Slaney implementation as preprocessing (ops/mel.py), mirroring the
reference's test/test_mel_loss.py parity requirement.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.ops.mel import mel_filterbank
from parallelwavegan_tpu.ops.stft import stft_magnitude


@dataclass(frozen=True)
class MelSpectrogram:
    """Log-mel spectrogram of a waveform batch: (B, T) -> (B, #frames, #mels)."""

    fs: int = 22050
    fft_size: int = 1024
    hop_size: int = 256
    win_length: int | None = None
    window: str = "hann"
    num_mels: int = 80
    fmin: float | None = 80
    fmax: float | None = 7600
    center: bool = True
    normalized: bool = False
    onesided: bool = True
    eps: float = 1e-10
    log_base: float | None = 10.0

    def __post_init__(self):
        if self.normalized or not self.onesided:
            raise ValueError("normalized/onesided overrides are not supported")

    @property
    def melmat(self) -> np.ndarray:
        return mel_filterbank(
            self.fs, self.fft_size, self.num_mels, self.fmin, self.fmax
        )

    def __call__(self, x):
        if x.ndim == 3:  # (B, T, C) -> (B*C, T)
            x = x.transpose(0, 2, 1).reshape(-1, x.shape[1])
        win_length = self.win_length or self.fft_size
        amp = stft_magnitude(
            x, self.fft_size, self.hop_size, win_length,
            center=self.center, eps=self.eps,
        )
        mel = jnp.maximum(amp @ jnp.asarray(self.melmat).T, self.eps)
        if self.log_base is None:
            return jnp.log(mel)
        elif self.log_base == 10.0:
            return jnp.log10(mel)
        elif self.log_base == 2.0:
            return jnp.log2(mel)
        raise ValueError(f"log_base {self.log_base} is not supported.")


@dataclass(frozen=True)
class MelSpectrogramLoss:
    """L1 between generated and groundtruth log-mels."""

    fs: int = 22050
    fft_size: int = 1024
    hop_size: int = 256
    win_length: int | None = None
    window: str = "hann"
    num_mels: int = 80
    fmin: float | None = 80
    fmax: float | None = 7600
    center: bool = True
    normalized: bool = False
    onesided: bool = True
    eps: float = 1e-10
    log_base: float | None = 10.0

    def __call__(self, y_hat, y):
        mel_fn = MelSpectrogram(
            fs=self.fs, fft_size=self.fft_size, hop_size=self.hop_size,
            win_length=self.win_length, window=self.window,
            num_mels=self.num_mels, fmin=self.fmin, fmax=self.fmax,
            center=self.center, eps=self.eps, log_base=self.log_base,
        )
        return jnp.mean(jnp.abs(mel_fn(y_hat) - mel_fn(y)))
