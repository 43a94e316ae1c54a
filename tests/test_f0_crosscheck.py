"""Empirical Harvest-vs-YIN drift bound on signals with KNOWN F0.

evaluate_f0's absolute log-F0-RMSE comparability rests on our Harvest
implementation (ops/harvest.py, reference surface
/root/reference/parallel_wavegan/bin/evaluate_f0.py:102-108) since
pyworld is not installable here. This suite quantifies, on a
deterministic synthetic corpus with exact ground-truth contours
(steady tones / vibrato / portamento / harmonic-rich + noise — the
yesno-style material plus the hard cases), both trackers' error vs truth
AND their mutual disagreement, and pins them as regression bounds.

Measured 2026-08-19 (fs 16k/22.05k, hop 5 ms, worst signal):
  harvest vs truth: log-F0 RMSE <= 0.0027, VUV error <= 1.3%
  yin     vs truth: log-F0 RMSE <= 0.0140, VUV error ~ 0%
  harvest vs yin  : log-F0 RMSE <= 0.0144, VUV disagreement <= 2.7%
Bounds below are ~1.7x the measured worst case. docs/F0_CROSSCHECK.md
has the per-signal table.
"""

import numpy as np
import pytest

from parallelwavegan_tpu.ops.f0 import yin_f0
from parallelwavegan_tpu.ops.harvest import harvest_f0


def suite(fs: int):
    """(name, audio, truth_f0(t) or None for unvoiced) at 5 ms hop."""
    dur = 1.5
    t = np.arange(int(fs * dur)) / fs
    rs = np.random.RandomState(hash(fs) % 2**31)

    def harmonics(f0_t, n=5, decay=1.0):
        phase = 2 * np.pi * np.cumsum(f0_t) / fs
        x = sum(np.sin((h + 1) * phase) / (h + 1) ** decay
                for h in range(n))
        return (0.3 * x / np.abs(x).max()).astype(np.float64)

    out = []
    for f0 in (110.0, 220.0):
        f0_t = np.full_like(t, f0)
        out.append((f"steady_{int(f0)}", harmonics(f0_t), f0_t))
    # vibrato: 180 Hz +-4 % at 5.5 Hz
    f0_t = 180.0 * (1 + 0.04 * np.sin(2 * np.pi * 5.5 * t))
    out.append(("vibrato", harmonics(f0_t), f0_t))
    # portamento: 120 -> 240 Hz exponential glide
    f0_t = 120.0 * (240.0 / 120.0) ** (t / dur)
    out.append(("portamento", harmonics(f0_t), f0_t))
    # harmonic-rich + amplitude modulation + noise floor (speech-like)
    f0_t = 140.0 * (1 + 0.02 * np.sin(2 * np.pi * 3.1 * t))
    x = harmonics(f0_t, n=8, decay=0.5)
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 2.3 * t)
    out.append(("rich_am_noise", x * am + 0.004 * rs.randn(len(t)), f0_t))
    # unvoiced-only: white noise (truth: all unvoiced)
    out.append(("noise", 0.1 * rs.randn(len(t)), np.zeros_like(t)))
    return out


def _metrics(f0_a, f0_b):
    """(log-F0 RMSE on co-voiced frames, VUV disagreement rate)."""
    n = min(len(f0_a), len(f0_b))
    a, b = np.asarray(f0_a[:n]), np.asarray(f0_b[:n])
    va, vb = a > 0, b > 0
    vuv = float(np.mean(va != vb))
    both = va & vb
    if not both.any():
        return 0.0, vuv
    rmse = float(np.sqrt(np.mean(
        (np.log(a[both]) - np.log(b[both])) ** 2)))
    return rmse, vuv


def _truth_track(f0_t, fs, hop, n_frames):
    idx = np.minimum(np.arange(n_frames) * hop, len(f0_t) - 1)
    return f0_t[idx]


@pytest.mark.parametrize("fs", [16000, 22050])
def test_harvest_and_yin_bounds_vs_truth_and_each_other(fs):
    hop = int(fs * 0.005)
    worst = {"h_truth": 0.0, "y_truth": 0.0, "h_y": 0.0,
             "h_vuv": 0.0, "y_vuv": 0.0, "hy_vuv": 0.0}
    for name, x, truth in suite(fs):
        h = harvest_f0(x, fs, hop)
        y = yin_f0(x, fs, hop)
        tr = _truth_track(truth, fs, hop, len(h))
        voiced_truth = tr > 0
        if voiced_truth.any():
            r, v = _metrics(h, tr)
            worst["h_truth"] = max(worst["h_truth"], r)
            worst["h_vuv"] = max(worst["h_vuv"], v)
            r, v = _metrics(y, _truth_track(truth, fs, hop, len(y)))
            worst["y_truth"] = max(worst["y_truth"], r)
            worst["y_vuv"] = max(worst["y_vuv"], v)
        else:
            # no truthful voicing: both must call (almost) everything
            # unvoiced
            assert np.mean(h > 0) < 0.05, (name, np.mean(h > 0))
            assert np.mean(y > 0) < 0.25, (name, np.mean(y > 0))
        r, v = _metrics(h, y)
        worst["h_y"] = max(worst["h_y"], r)
        worst["hy_vuv"] = max(worst["hy_vuv"], v)

    # regression bounds: ~1.7x the 2026-08-19 measured worst case
    assert worst["h_truth"] < 0.005, worst
    assert worst["h_vuv"] < 0.025, worst
    assert worst["y_truth"] < 0.024, worst
    assert worst["y_vuv"] < 0.02, worst
    assert worst["h_y"] < 0.025, worst
    assert worst["hy_vuv"] < 0.05, worst
