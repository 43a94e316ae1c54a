#!/usr/bin/env python3
"""Synthetic CVSS-C stand-in: train/dev/test subdirs of short 22.05 kHz
wavs, so the recipe dry-runs end-to-end in zero-egress environments.

Waveform content is harmonic + AM noise (same generator family as the
yesno fixture); names are unique per subset as the reference's layout
requires (/root/reference/egs/cvss_c/voc1/run.sh:20-27).
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "..")
)

from parallelwavegan_tpu.utils.io import write_wav  # noqa: E402


def main():
    outdir = sys.argv[1]
    fs = int(sys.argv[2]) if len(sys.argv) > 2 else 22050
    rs = np.random.RandomState(0)
    counts = {"train": 20, "dev": 5, "test": 5}
    for subset, n in counts.items():
        sub = os.path.join(outdir, subset)
        os.makedirs(sub, exist_ok=True)
        for i in range(n):
            dur = rs.uniform(1.0, 2.0)
            t = np.arange(int(fs * dur)) / fs
            f0 = rs.uniform(110, 220)
            wav = np.zeros_like(t)
            for h in range(1, 5):
                wav += np.sin(2 * np.pi * f0 * h * t + rs.rand() * 6.28) / h
            am = 0.5 + 0.5 * np.sin(2 * np.pi * rs.uniform(1.0, 3.0) * t)
            wav = 0.3 * wav * am + 0.005 * rs.randn(len(t))
            write_wav(os.path.join(sub, f"{subset}_utt{i:04d}.wav"),
                      fs, wav.astype(np.float32))
    print(f"wrote fake CVSS-C corpus to {outdir}: {counts}")


if __name__ == "__main__":
    main()
