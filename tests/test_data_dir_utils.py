"""Kaldi data-dir utility contract (egs/utils/data_dir.py).

Round-5 additions close the reference's utils/ surface at function
granularity: apply_map.pl, filter_scp.pl, get_utt2dur.sh,
split_data.sh, resample_data_dir.sh (the resample really resamples —
same polyphase filter preprocess uses — instead of sox pipes)."""

import os
import subprocess
import sys

import numpy as np

DATA_DIR = os.path.join(
    os.path.dirname(__file__), "..", "egs", "utils", "data_dir.py"
)


def _run(args, stdin=None):
    return subprocess.run(
        [sys.executable, DATA_DIR] + args,
        input=stdin, capture_output=True, text=True,
    )


def _make_dir(tmp_path, n=6, fs=8000):
    from parallelwavegan_tpu.utils.io import write_wav

    d = tmp_path / "data"
    wavs = tmp_path / "wavs"
    os.makedirs(wavs)
    os.makedirs(d)
    rs = np.random.RandomState(0)
    with open(d / "wav.scp", "w") as scp, open(d / "utt2spk", "w") as u2s:
        for i in range(n):
            path = wavs / f"utt{i:02d}.wav"
            dur = 0.5 + 0.1 * i
            write_wav(str(path), fs,
                      (0.1 * rs.randn(int(fs * dur))).astype(np.float32))
            scp.write(f"utt{i:02d} {path}\n")
            u2s.write(f"utt{i:02d} spk{i % 2}\n")
    return d


def test_apply_map_field_selection(tmp_path):
    m = tmp_path / "map.txt"
    m.write_text("a ALPHA\nb BETA\n")
    r = _run(["apply-map", str(m)], stdin="a x\nb y\n")
    assert r.returncode == 0 and r.stdout == "ALPHA x\nBETA y\n"
    r = _run(["apply-map", str(m), "-f", "2"], stdin="x a\n")
    assert r.stdout == "x ALPHA\n"
    # unmapped key fails loudly unless --permissive
    assert _run(["apply-map", str(m)], stdin="zz 1\n").returncode != 0
    r = _run(["apply-map", str(m), "--permissive"], stdin="zz 1\na q\n")
    assert r.returncode == 0 and r.stdout == "ALPHA q\n"


def test_filter_scp_keep_and_exclude(tmp_path):
    ids = tmp_path / "ids"
    ids.write_text("u1\nu3\n")
    scp = "u1 a\nu2 b\nu3 c\n"
    r = _run(["filter-scp", str(ids)], stdin=scp)
    assert r.stdout == "u1 a\nu3 c\n"
    r = _run(["filter-scp", str(ids), "--exclude"], stdin=scp)
    assert r.stdout == "u2 b\n"


def test_utt2dur_matches_waveform_lengths(tmp_path):
    d = _make_dir(tmp_path)
    assert _run(["utt2dur", str(d)]).returncode == 0
    durs = dict(
        line.split() for line in open(d / "utt2dur").read().splitlines()
    )
    assert len(durs) == 6
    assert abs(float(durs["utt00"]) - 0.5) < 0.01
    assert abs(float(durs["utt05"]) - 1.0) < 0.01


def test_split_data_partitions_all_utts(tmp_path):
    d = _make_dir(tmp_path)
    assert _run(["split-data", str(d), "3"]).returncode == 0
    seen = []
    for i in (1, 2, 3):
        sub = d / "split3" / str(i)
        utts = [ln.split()[0] for ln in open(sub / "wav.scp")]
        spk = [ln.split()[0] for ln in open(sub / "utt2spk")]
        assert utts == spk
        seen += utts
    assert sorted(seen) == [f"utt{i:02d}" for i in range(6)]


def test_resample_really_resamples(tmp_path):
    from parallelwavegan_tpu.utils.io import read_wav

    d = _make_dir(tmp_path, n=2, fs=8000)
    dst = tmp_path / "data16k"
    r = _run(["resample", str(d), str(dst), "--fs", "16000"])
    assert r.returncode == 0, r.stderr
    new = dict(
        line.split() for line in open(dst / "wav.scp").read().splitlines()
    )
    fs0, x0 = read_wav(new["utt00"])
    assert fs0 == 16000
    fs_src, x_src = read_wav(
        dict(ln.split() for ln in open(d / "wav.scp"))["utt00"]
    )
    assert abs(len(x0) - 2 * len(x_src)) <= 2
    # utt2spk carried over
    assert (dst / "utt2spk").exists()
