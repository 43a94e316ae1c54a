#!/usr/bin/env python3
"""Template data preparation: edit the glob to match your corpus layout."""

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--num-dev", type=int, default=100)
    parser.add_argument("--num-eval", type=int, default=100)
    args = parser.parse_args()

    # EDIT HERE: where your wavs live
    wavs = sorted(glob.glob(os.path.join(args.db_root, "**", "*.wav"),
                            recursive=True))
    assert wavs, f"no wavs under {args.db_root}"
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
        os.makedirs(os.path.join(args.data_dir, name), exist_ok=True)
        with open(os.path.join(args.data_dir, name, "wav.scp"), "w") as f:
            for utt_id, wav in items:
                f.write(f"{utt_id} {wav}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
