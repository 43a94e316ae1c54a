"""Pseudo-QMF filterbank (PQMF) as fused XLA convolutions.

Behavioral reference: /root/reference/parallel_wavegan/layers/pqmf.py
(prototype design :14-48, cosine-modulated analysis/synthesis banks
:79-104, analysis = conv + stride-downsample :122-134, synthesis =
zero-stuff upsample * subbands + conv :136-149).

TPU design: the reference composes two convolutions per direction (filter
conv + a delta-kernel up/down-sampling conv). Here each direction is a
*single* ``lax.conv_general_dilated`` call -- analysis is a strided conv
(1 -> subbands channels), synthesis an input-dilated conv
(subbands -> 1) -- so XLA emits one MXU-friendly op with no intermediate
buffer. Filter design is pure numpy at trace time (np.kaiser, so neither
scipy nor librosa is required).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def design_prototype_filter(
    taps: int = 62, cutoff_ratio: float = 0.142, beta: float = 9.0
) -> np.ndarray:
    """Kaiser-window lowpass prototype, impulse response of length taps + 1.

    Same method as the reference (pqmf.py:14-48): ideal sinc lowpass at
    ``pi * cutoff_ratio`` windowed by a Kaiser window.
    """
    assert taps % 2 == 0, "The number of taps must be even."
    assert 0.0 < cutoff_ratio < 1.0, "Cutoff ratio must be in (0, 1)."
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # sinc limit at n = 0
    return h_i * np.kaiser(taps + 1, beta)


@functools.lru_cache(maxsize=None)
def pqmf_filters(
    subbands: int = 4,
    taps: int = 62,
    cutoff_ratio: float = 0.142,
    beta: float = 9.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Cosine-modulated analysis/synthesis banks, each (subbands, taps + 1)."""
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    k = np.arange(subbands)[:, None]
    n = np.arange(taps + 1)[None, :] - taps / 2
    phase = (2 * k + 1) * (np.pi / (2 * subbands)) * n
    shift = ((-1.0) ** k) * np.pi / 4
    h_analysis = 2 * h_proto[None, :] * np.cos(phase + shift)
    h_synthesis = 2 * h_proto[None, :] * np.cos(phase - shift)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


class PQMF:
    """Near-perfect-reconstruction pseudo-QMF bank over NTC tensors.

    ``analysis``: (B, T, 1) -> (B, T // subbands, subbands)
    ``synthesis``: (B, T // subbands, subbands) -> (B, T, 1)

    The default (taps=62, cutoff 0.142, beta=9.0) is the reference's tuning
    for 4 subbands (pqmf.py:61-65). Stateless: filters are baked constants,
    so instances are safe to close over inside jit.
    """

    def __init__(
        self,
        subbands: int = 4,
        taps: int = 62,
        cutoff_ratio: float = 0.142,
        beta: float = 9.0,
    ):
        self.subbands = subbands
        self.taps = taps
        h_analysis, h_synthesis = pqmf_filters(subbands, taps, cutoff_ratio, beta)
        # gather-form (K, I, O) kernels for NTC convs
        self._analysis_kernel = jnp.asarray(h_analysis.T[:, None, :])  # (K,1,S)
        self._synthesis_kernel = jnp.asarray(
            np.transpose(h_synthesis, (1, 0))[:, :, None]  # (K,S,1)
        )

    def analysis(self, x):
        """Split (B, T, 1) into subband signals (B, T // subbands, subbands)."""
        pad = self.taps // 2
        return lax.conv_general_dilated(
            x,
            self._analysis_kernel.astype(x.dtype),
            window_strides=(self.subbands,),
            padding=[(pad, pad)],
            dimension_numbers=("NTC", "TIO", "NTC"),
        )

    def synthesis(self, x):
        """Reconstruct (B, T * subbands, 1) from subband signals.

        One input-dilated conv == the reference's zero-stuffing transposed
        conv (x subbands gain) followed by the synthesis filter conv.
        """
        pad = self.taps // 2
        s = self.subbands
        return lax.conv_general_dilated(
            x,
            (self._synthesis_kernel * s).astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad + s - 1)],
            lhs_dilation=(s,),
            dimension_numbers=("NTC", "TIO", "NTC"),
        )
