"""Property tests for the numpy Harvest F0 estimator (ops/harvest.py).

pyworld (the reference's extractor, evaluate_f0.py:102-108) is not
installable here, so correctness is pinned on synthetic signals whose
F0 is known analytically — including the classic failure modes of
simpler trackers: octave-up on harmonic-rich signals, octave-down /
subharmonics on weak-fundamental signals, and voicing false-positives
on noise.
"""

import numpy as np
import pytest

from parallelwavegan_tpu.ops.harvest import harvest_f0
from parallelwavegan_tpu.ops.metrics import f0_metrics

FS = 16000
HOP = 256


def _t(seconds=2.0, fs=FS):
    return np.arange(int(fs * seconds)) / fs


def test_pure_tone_tracks_exactly():
    f0 = harvest_f0(np.sin(2 * np.pi * 220 * _t()), FS, HOP)
    assert np.mean(f0 > 0) > 0.95
    interior = f0[2:-2]
    assert np.all(interior > 0)
    # interior frames track to ~1e-5 relative; edges may deviate (the
    # refinement window is zero-padded there, as in pyworld)
    assert np.abs(interior - 220).max() / 220 < 1e-3


def test_white_noise_is_unvoiced():
    rng = np.random.RandomState(0)
    f0 = harvest_f0(rng.randn(FS * 2) * 0.3, FS, HOP)
    assert np.mean(f0 > 0) < 0.05


def test_silence_is_unvoiced():
    t = _t(1.0)
    x = np.concatenate(
        [np.zeros(FS // 2), np.sin(2 * np.pi * 220 * t), np.zeros(FS // 2)]
    )
    f0 = harvest_f0(x, FS, HOP)
    head = f0[: int(0.4 * FS / HOP)]
    mid = f0[int(0.7 * FS / HOP): int(1.2 * FS / HOP)]
    assert np.mean(head > 0) < 0.1
    assert np.mean(mid > 0) > 0.9


def test_harmonic_rich_no_octave_up():
    # sawtooth-like spectrum: energy at every harmonic tempts an
    # octave-up error in interval-based trackers
    t = _t()
    rng = np.random.RandomState(1)
    x = sum(
        (0.8 ** k) * np.sin(2 * np.pi * 150 * k * t + k) for k in range(1, 8)
    ) + 0.05 * rng.randn(len(t))
    f0 = harvest_f0(x, FS, HOP)
    v = f0[f0 > 0]
    assert len(v) > 0.9 * len(f0)
    assert abs(np.median(v) - 150) / 150 < 0.01
    assert np.abs(v - 150).max() / 150 < 0.05  # no octave/subharmonic frames


def test_weak_fundamental_no_subharmonic():
    # 2nd/3rd harmonics dominate the fundamental — octave-down territory
    t = _t()
    rng = np.random.RandomState(2)
    x = (
        0.2 * np.sin(2 * np.pi * 320 * t)
        + 0.9 * np.sin(2 * np.pi * 640 * t + 1)
        + 0.7 * np.sin(2 * np.pi * 960 * t + 2)
        + 0.02 * rng.randn(len(t))
    )
    f0 = harvest_f0(x, FS, HOP)
    v = f0[f0 > 0]
    assert len(v) > 0.9 * len(f0)
    assert abs(np.median(v) - 320) / 320 < 0.02
    assert np.abs(v - 320).max() / 320 < 0.1


def test_vibrato_and_glide_follow_contour():
    t = _t()
    for name, inst in [
        ("vibrato", 200 + 20 * np.sin(2 * np.pi * 5 * t)),
        ("glide", 120 * 2 ** (t / 2)),
    ]:
        x = np.sin(2 * np.pi * np.cumsum(inst) / FS)
        f0 = harvest_f0(x, FS, HOP)
        gt = inst[::HOP][: len(f0)]
        m = f0 > 0
        assert m.mean() > 0.9, name
        rmse = np.sqrt(np.mean((np.log(f0[m]) - np.log(gt[m])) ** 2))
        assert rmse < 0.02, (name, rmse)


def test_speechlike_jittered_contour_22k():
    # jitter + vibrato + shimmer + breath noise at the LJSpeech rate
    fs, hop = 22050, 256
    t = np.arange(fs * 2) / fs
    rng = np.random.RandomState(3)
    inst = (
        180
        * (1 + 0.02 * np.cumsum(rng.randn(len(t))) / np.sqrt(len(t)))
        * (1 + 0.03 * np.sin(2 * np.pi * 4.5 * t))
    )
    inst = np.clip(inst, 100, 300)
    ph = 2 * np.pi * np.cumsum(inst) / fs
    x = sum((0.7 ** k) * np.sin(k * ph + k) for k in range(1, 10)) * (
        1 + 0.1 * np.sin(2 * np.pi * 3 * t)
    ) + 0.08 * rng.randn(len(t))
    f0 = harvest_f0(x, fs, hop)
    gt = inst[::hop][: len(f0)]
    m = f0 > 0
    assert m.mean() > 0.9
    rmse = np.sqrt(np.mean((np.log(f0[m]) - np.log(gt[m])) ** 2))
    assert rmse < 0.02


def test_f0_metrics_harvest_self_comparison():
    # identical audio -> zero log-F0 RMSE, zero VUV error, 100% semitone acc
    t = _t()
    x = np.sin(2 * np.pi * np.cumsum(200 + 20 * np.sin(2 * np.pi * 5 * t)) / FS)
    m = f0_metrics(x, x, FS, tracker="harvest")
    assert m["log_f0_rmse"] < 1e-6
    assert m["vuv_error_rate"] == 0.0
    assert m["semitone_acc"] == 1.0


def test_f0_metrics_tracker_flag():
    t = _t(1.0)
    x = np.sin(2 * np.pi * 220 * t)
    for tracker in ("harvest", "yin"):
        m = f0_metrics(x, x, FS, tracker=tracker)
        assert m["log_f0_rmse"] < 1e-6, tracker
    with pytest.raises(ValueError):
        f0_metrics(x, x, FS, tracker="nope")


def test_short_input_does_not_crash():
    for n in (0, 1, 100, 1000):
        f0 = harvest_f0(np.zeros(n), FS, HOP)
        assert np.all(f0 == 0)


def test_logf0_and_vuv_contract():
    # reference contract (preprocess.py:136-185): (#frames, 2), continuous
    # log-F0 everywhere (edges held, gaps interpolated), binary V/UV
    from parallelwavegan_tpu.ops.f0 import logf0_and_vuv

    hop = 64
    t = _t(2.0)
    x = np.concatenate(
        [np.zeros(FS // 2), np.sin(2 * np.pi * 220 * t), np.zeros(FS // 2)]
    )
    local = logf0_and_vuv(x, FS, hop)
    assert local is not None
    assert local.ndim == 2 and local.shape[1] == 2
    assert local.dtype == np.float32
    lf0, vuv = local[:, 0], local[:, 1]
    assert set(np.unique(vuv)) <= {0.0, 1.0}
    assert np.all(np.isfinite(lf0))  # continuous: no holes in unvoiced spans
    voiced = vuv > 0
    assert voiced.any() and (~voiced).any()
    assert np.abs(np.median(lf0[voiced]) - np.log(220)) < 0.05
    # unvoiced head/tail hold the boundary voiced value
    first_v = np.flatnonzero(voiced)[0]
    assert np.allclose(lf0[:first_v], lf0[first_v])


def test_logf0_and_vuv_all_unvoiced_returns_none():
    from parallelwavegan_tpu.ops.f0 import logf0_and_vuv

    rng = np.random.RandomState(0)
    assert logf0_and_vuv(rng.randn(FS) * 0.1, FS, 64) is None
    assert logf0_and_vuv(np.zeros(FS), FS, 64) is None


def test_short_high_fs_utterance_stays_voiced():
    """The >=3-periods floor raise must use the TRUE fs: a 40 ms 150 Hz
    tone at 24 kHz fits 6 periods and must not come back all-unvoiced."""
    fs, hop = 24000, 64
    t = np.arange(int(0.04 * fs)) / fs
    x = np.sin(2 * np.pi * 150.0 * t).astype(np.float64)
    f0 = harvest_f0(x, fs, hop)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0
    np.testing.assert_allclose(np.median(voiced), 150.0, rtol=0.05)
