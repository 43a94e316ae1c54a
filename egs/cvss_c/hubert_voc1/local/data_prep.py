#!/usr/bin/env python3
"""CVSS-C data preparation: wav.scp + train/dev/eval split.

Mirrors the reference's egs/ljspeech/voc1/local/data_prep.sh split
convention (deterministic ordering, dev/eval carved off the tail).
"""

import argparse
import glob
import os


def write_scp(utts, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for utt_id, wav in utts:
            f.write(f"{utt_id} {wav}\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--num-dev", type=int, default=250)
    parser.add_argument("--num-eval", type=int, default=250)
    args = parser.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.db_root, "wav", "*.wav")))
    assert len(wavs) > 0, f"no wavs under {args.db_root}/wavs"
    utts = [
        (os.path.splitext(os.path.basename(w))[0], os.path.abspath(w))
        for w in wavs
    ]
    nd, ne = args.num_dev, args.num_eval
    splits = {
        "train_nodev": utts[: -(nd + ne)],
        "dev": utts[-(nd + ne) : -ne],
        "eval": utts[-ne:],
    }
    for name, items in splits.items():
        write_scp(items, os.path.join(args.data_dir, name, "wav.scp"))
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
