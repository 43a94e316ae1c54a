#!/usr/bin/env python3
"""Generate a synthetic stand-in for the yesno corpus (60 short 8 kHz wavs).

Lets the recipe run end-to-end in zero-egress environments; waveform
content is harmonic + AM noise, names follow the yesno 0_1_0_... pattern.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", ".."))

from parallelwavegan_tpu.utils.io import write_wav  # noqa: E402


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    rs = np.random.RandomState(0)
    fs = 8000
    seen = set()
    for i in range(60):
        while True:
            bits = tuple(rs.randint(0, 2, 8))
            if bits not in seen:
                seen.add(bits)
                break
        name = "_".join(str(b) for b in bits) + ".wav"
        dur = rs.uniform(2.0, 4.0)
        t = np.arange(int(fs * dur)) / fs
        f0 = rs.uniform(110, 220)
        wav = np.zeros_like(t)
        for h in range(1, 5):
            wav += np.sin(2 * np.pi * f0 * h * t + rs.rand() * 6.28) / h
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rs.uniform(1.0, 3.0) * t)
        wav = 0.3 * wav * am + 0.005 * rs.randn(len(t))
        write_wav(os.path.join(outdir, name), fs, wav.astype(np.float32))
    print(f"wrote 60 synthetic wavs to {outdir}")


if __name__ == "__main__":
    main()
