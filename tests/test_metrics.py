"""Objective-metric sanity: identical audio scores perfectly; DTW aligns."""

import numpy as np

from parallelwavegan_tpu.ops.metrics import (
    dtw_path,
    f0_metrics,
    mel_cepstral_distortion,
)
from parallelwavegan_tpu.ops.f0 import yin_f0


def _voiced_signal(fs=16000, dur=1.0, f0=150.0):
    t = np.arange(int(fs * dur)) / fs
    sig = np.zeros_like(t)
    for h in (1, 2, 3):
        sig += np.sin(2 * np.pi * f0 * h * t) / h
    return (0.3 * sig).astype(np.float32)


def test_mcd_zero_for_identical_audio():
    x = _voiced_signal()
    assert mel_cepstral_distortion(x, x, 16000) < 1e-4


def test_mcd_positive_for_different_audio():
    a = _voiced_signal(f0=150.0)
    b = _voiced_signal(f0=220.0)
    assert mel_cepstral_distortion(a, b, 16000) > 1.0


def test_dtw_identity_alignment():
    x = np.random.RandomState(0).randn(50, 4)
    px, py = dtw_path(x, x)
    np.testing.assert_array_equal(px, py)


def test_dtw_handles_time_stretch():
    x = np.random.RandomState(1).randn(40, 4)
    y = np.repeat(x, 2, axis=0)  # 2x slower
    px, py = dtw_path(x, y)
    # every aligned pair must actually match content
    d = np.abs(x[px] - y[py]).max()
    assert d < 1e-12


def test_yin_tracks_f0():
    for f0 in (120.0, 200.0, 300.0):
        x = _voiced_signal(f0=f0)
        track = yin_f0(x, 16000, 256, fmin=70, fmax=340)
        voiced = track[track > 0]
        assert len(voiced) > 10
        assert abs(np.median(voiced) - f0) / f0 < 0.03, (f0, np.median(voiced))


def test_f0_metrics_perfect_for_identical():
    x = _voiced_signal()
    m = f0_metrics(x, x, 16000)
    assert m["log_f0_rmse"] < 1e-6
    assert m["semitone_acc"] == 1.0
    assert m["vuv_error_rate"] == 0.0
