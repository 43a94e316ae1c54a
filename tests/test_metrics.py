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


def test_wav_index_scp_and_segments(tmp_path):
    """wav_index resolves dirs, scp files, and sibling segments slicing."""
    import numpy as np
    from scipy.io import wavfile

    from parallelwavegan_tpu.utils.io import read_wav_entry, wav_index

    fs = 8000
    wav = (np.random.RandomState(0).randn(fs * 2) * 1000).astype(np.int16)
    wavfile.write(tmp_path / "rec1.wav", fs, wav)

    # directory mode
    idx = wav_index(str(tmp_path))
    assert set(idx) == {"rec1"}
    fs2, data = read_wav_entry(idx["rec1"])
    assert fs2 == fs and len(data) == len(wav)

    # scp + segments mode
    (tmp_path / "wav.scp").write_text(f"rec1 {tmp_path}/rec1.wav\n")
    (tmp_path / "segments").write_text(
        "utt_a rec1 0.0 1.0\nutt_b rec1 1.0 2.0\n"
    )
    idx = wav_index(str(tmp_path / "wav.scp"))
    assert set(idx) == {"utt_a", "utt_b"}
    _, seg = read_wav_entry(idx["utt_a"])
    assert len(seg) == fs


def test_postprocess_f0_cleanup():
    from parallelwavegan_tpu.ops.f0 import postprocess_f0

    f0 = np.full(20, 150.0, np.float32)
    f0[5] = 0.0          # 1-frame unvoiced gap -> bridged
    f0[10] = 300.0       # octave jump -> median-suppressed
    f0[:2] = 0.0
    out = postprocess_f0(f0)
    assert out[5] > 0 and abs(out[5] - 150.0) < 1.0
    assert abs(out[10] - 150.0) < 1.0
    # isolated voiced island removed
    f0 = np.zeros(20, np.float32)
    f0[7] = 200.0
    out = postprocess_f0(f0)
    assert out[7] == 0.0
