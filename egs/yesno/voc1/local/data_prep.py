#!/usr/bin/env python3
"""yesno data preparation: wav.scp + train/dev/eval split (+fake segments).

Mirrors the reference's local/data_prep.sh + --use_fake_segments mode
(egs/yesno/voc1/run.sh:24,52-57): the last 10 utterances go to eval, the
previous 10 to dev, the rest to train_nodev.
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
    parser.add_argument("--use-fake-segments", default="false")
    args = parser.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.db_root, "*.wav")))
    assert len(wavs) > 0, f"no wavs under {args.db_root}"
    utts = [
        (os.path.splitext(os.path.basename(w))[0], os.path.abspath(w))
        for w in wavs
    ]
    splits = {
        "train_nodev": utts[:-20],
        "dev": utts[-20:-10],
        "eval": utts[-10:],
    }
    fake_segments = args.use_fake_segments.lower() == "true"
    for name, items in splits.items():
        write_scp(items, os.path.join(args.data_dir, name, "wav.scp"))
        if fake_segments:
            # pretend each recording holds two segments covering it
            seg_path = os.path.join(args.data_dir, name, "segments")
            with open(seg_path, "w") as f:
                for utt_id, _ in items:
                    f.write(f"{utt_id}-seg1 {utt_id} 0.0 1.0\n")
                    f.write(f"{utt_id}-seg2 {utt_id} 1.0 -1\n")
    print(
        "prepared data dirs:",
        {k: len(v) for k, v in splits.items()},
    )


if __name__ == "__main__":
    main()
