#!/usr/bin/env python3
"""KSS (Korean Single Speaker) data prep.

Behavioral reference: /root/reference/egs/kss/voc1/local/data_prep.sh
(wavs under kss/{1..4}/; some are stereo -> downmixed here with scipy
instead of a sox pipe in wav.scp).
"""

import argparse
import glob
import os

import numpy as np
from scipy.io import wavfile


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="dir containing kss/")
    parser.add_argument("data_dir")
    parser.add_argument("--num-dev", type=int, default=250)
    parser.add_argument("--num-eval", type=int, default=250)
    parser.add_argument("--mono-dumpdir", default="data/mono_wav")
    args = parser.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.db_root, "kss", "*", "*.wav")))
    assert wavs, f"no wavs under {args.db_root}/kss"
    os.makedirs(args.mono_dumpdir, exist_ok=True)
    utts = []
    for w in wavs:
        stem = os.path.splitext(os.path.basename(w))[0]
        utt = f"kss_{stem.replace('/', '_')}"
        fs, data = wavfile.read(w)
        if data.ndim == 2:  # downmix stereo
            mono = data.astype(np.float32).mean(axis=1)
            out = os.path.join(args.mono_dumpdir, f"{utt}.wav")
            wavfile.write(out, fs, mono.astype(data.dtype))
            w = out
        utts.append((utt, os.path.abspath(w)))

    nd, ne = args.num_dev, args.num_eval
    splits = {
        "train_nodev": utts[: -(nd + ne)],
        "dev": utts[-(nd + ne) : -ne],
        "eval": utts[-ne:],
    }
    for name, items in splits.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as f:
            for utt, wav in items:
                f.write(f"{utt} {wav}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
