#!/usr/bin/env python3
"""KiSing data prep: segmented-wav/clean + segmented-label alignments.

Behavioral reference: /root/reference/egs/kising/voc1/local/data_prep.py
(dev = song 435, eval = song 434; wavs resampled to the target fs).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "utils"))
from singing_data_prep import prepare  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--fs", type=int, default=24000)
    args = parser.parse_args()

    def label_for(w):
        song = os.path.basename(w).split("_")[0]
        return os.path.join(args.db_root, "segmented-label",
                            f"0{song}_align_all.txt")

    prepare(
        args.db_root, args.data_dir, prefix="kising", spk="kising",
        wav_glob=os.path.join("segmented-wav", "clean", "*.wav"),
        label_for=label_for,
        song_id=lambda w: os.path.basename(w).split("_")[0],
        dev_songs=["435"],
        eval_songs=["434"],
        resample_to=args.fs,
    )


if __name__ == "__main__":
    main()
