#!/usr/bin/env python3
"""Synthetic stand-in for CVSS-C audio + HuBERT units (zero-egress CI).

Writes <db_root>/wav/*.wav (16 kHz harmonic+noise) and <db_root>/units.txt
("utt u1 u2 ..."), one unit id per hop_size frame with run lengths of 2-8
frames so the duration model sees non-trivial (code, duration) pairs.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", ".."))

from parallelwavegan_tpu.utils.io import write_wav  # noqa: E402


def main():
    outdir = sys.argv[1]
    hop = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    num_units = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    wav_dir = os.path.join(outdir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    fs = 16000
    lines = []
    for i in range(40):
        utt_id = f"fake{i:04d}"
        dur = rs.uniform(1.5, 3.0)
        t = np.arange(int(fs * dur)) / fs
        f0 = rs.uniform(110, 220)
        wav = np.zeros_like(t)
        for h in range(1, 5):
            wav += np.sin(2 * np.pi * f0 * h * t + rs.rand() * 6.28) / h
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rs.uniform(1.0, 3.0) * t)
        wav = 0.3 * wav * am + 0.005 * rs.randn(len(t))
        write_wav(os.path.join(wav_dir, utt_id + ".wav"), fs,
                  wav.astype(np.float32))
        n_frames = len(wav) // hop
        units = []
        while len(units) < n_frames:
            units.extend([int(rs.randint(0, num_units))] * int(rs.randint(2, 9)))
        lines.append(utt_id + " " + " ".join(str(u) for u in units[:n_frames]))
    with open(os.path.join(outdir, "units.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote 40 synthetic wavs + units to {outdir}")


if __name__ == "__main__":
    main()
