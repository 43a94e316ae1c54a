"""Multi-resolution STFT losses as pure JAX functions.

Behavioral reference: /root/reference/parallel_wavegan/losses/stft_loss.py
(stft magnitude clamp :40, spectral convergence :43-61, log-mag L1 :64-82,
multi-resolution averaging + sub-band flattening :121-170). The FFTs run as
batched XLA rFFTs; all resolutions are computed inside one jitted step so
XLA overlaps them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp

from parallelwavegan_tpu.ops.stft import stft_magnitude


def spectral_convergence_loss(x_mag, y_mag):
    """||Y - X||_F / ||Y||_F (Frobenius over the full batch tensor)."""
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def log_stft_magnitude_loss(x_mag, y_mag):
    """L1 between log magnitudes."""
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


@dataclass(frozen=True)
class STFTLoss:
    """Single-resolution STFT loss -> (spectral_convergence, log_magnitude)."""

    fft_size: int = 1024
    shift_size: int = 120
    win_length: int = 600

    def __call__(self, x, y):
        x_mag = stft_magnitude(x, self.fft_size, self.shift_size, self.win_length)
        y_mag = stft_magnitude(y, self.fft_size, self.shift_size, self.win_length)
        return (
            spectral_convergence_loss(x_mag, y_mag),
            log_stft_magnitude_loss(x_mag, y_mag),
        )


@dataclass(frozen=True)
class MultiResolutionSTFTLoss:
    """Average of STFT losses over several resolutions.

    Accepts (B, T) or (B, T, C) (sub-band signals are flattened to
    (B*C, T) exactly like the reference's (B,C,T)->(BxC,T)).
    """

    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)
    window: str = "hann_window"

    def __post_init__(self):
        assert len(self.fft_sizes) == len(self.hop_sizes) == len(self.win_lengths)

    def __call__(self, x, y):
        if x.ndim == 3:
            x = x.transpose(0, 2, 1).reshape(-1, x.shape[1])
            y = y.transpose(0, 2, 1).reshape(-1, y.shape[1])
        sc_loss = 0.0
        mag_loss = 0.0
        n = len(self.fft_sizes)
        for fs, ss, wl in zip(self.fft_sizes, self.hop_sizes, self.win_lengths):
            sc, mag = STFTLoss(fs, ss, wl)(x, y)
            sc_loss += sc
            mag_loss += mag
        return sc_loss / n, mag_loss / n
