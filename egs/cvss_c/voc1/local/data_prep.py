#!/usr/bin/env python3
"""CVSS-C data preparation: per-subset wav.scp files.

Mirrors the reference's egs/cvss_c/voc1/local/data_prep.sh layout
(/root/reference/egs/cvss_c/voc1/local/data_prep.sh): the database root
contains train/ dev/ test/ subdirectories of uniquely-named wavs; each
becomes data/<subset>/wav.scp. Resampling to the config sampling_rate
happens inside preprocess (ops/mel.py loads + resamples), so no sox
pipes are needed here.
"""

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument(
        "--subsets", default="train,dev,test",
        help="comma-separated subset dir names under db_root",
    )
    args = parser.parse_args()

    counts = {}
    for subset in args.subsets.split(","):
        wavs = sorted(
            glob.glob(os.path.join(args.db_root, subset, "**", "*.wav"),
                      recursive=True)
        )
        assert len(wavs) > 0, f"no wavs under {args.db_root}/{subset}"
        out = os.path.join(args.data_dir, subset, "wav.scp")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        seen = set()
        with open(out, "w") as f:
            for w in wavs:
                utt_id = os.path.splitext(os.path.basename(w))[0]
                assert utt_id not in seen, f"duplicate utt id {utt_id}"
                seen.add(utt_id)
                f.write(f"{utt_id} {os.path.abspath(w)}\n")
        counts[subset] = len(wavs)
    print("prepared:", counts)


if __name__ == "__main__":
    main()
