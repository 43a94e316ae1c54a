#!/usr/bin/env python3
"""Natsume data prep: wav/<song>.wav + mono_label/<song>.lab pairs.

Behavioral reference: /root/reference/egs/natsume/voc1/local/dataset_split.py
(song-level train/dev/eval split; segments are derived afterwards by
egs/utils/prep_singing_segments.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "utils"))
from singing_data_prep import prepare  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--fs", type=int, default=24000,
                        help="resample target (must match conf sampling_rate)")
    args = parser.parse_args()
    prepare(
        args.db_root, args.data_dir, prefix="natsume", spk="natsume",
        wav_glob="wav/*.wav",
        label_for=lambda w: w.replace("/wav/", "/mono_label/")[:-4] + ".lab",
        dev_songs=["9", "22", "38", "43", "44"],
        eval_songs=["2", "13", "24", "25", "27"],
        resample_to=args.fs,
    )


if __name__ == "__main__":
    main()
