#!/usr/bin/env python3
"""JNAS data prep: multi-speaker wav.scp from a speaker list.

Behavioral reference: /root/reference/egs/jnas/voc1/local/data_prep.sh
(train from WAVES_HS/<spk>, eval from DOCS/Test_set, shuffled dev split).
"""

import argparse
import glob
import os
import random


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="JNAS corpus root")
    parser.add_argument("data_dir")
    parser.add_argument("--spk-list", default=None,
                        help="file with one speaker id per line; "
                             "default: every dir under WAVES_HS")
    parser.add_argument("--num-dev", type=int, default=500)
    parser.add_argument("--wav-type", default="HS", choices=["HS", "DT"])
    parser.add_argument("--seed", type=int, default=777)
    args = parser.parse_args()

    wav_root = os.path.join(args.db_root, f"WAVES_{args.wav_type}")
    if args.spk_list:
        with open(args.spk_list) as f:
            spks = [line.strip() for line in f if line.strip()]
    else:
        spks = sorted(os.listdir(wav_root))

    utts = []
    for spk in spks:
        wavdir = os.path.join(wav_root, spk)
        assert os.path.isdir(wavdir), f"missing {wavdir}"
        for w in sorted(glob.glob(os.path.join(wavdir, "**", "*.wav"),
                                  recursive=True)):
            stem = os.path.splitext(os.path.basename(w))[0]
            utts.append((f"{spk}_{stem}", os.path.abspath(w), spk))
    assert utts, f"no wavs under {wav_root}"
    random.Random(args.seed).shuffle(utts)

    eval_wavs = sorted(glob.glob(os.path.join(
        args.db_root, "DOCS", "Test_set", "**", "*.wav"), recursive=True))
    evals = [(os.path.splitext(os.path.basename(w))[0], os.path.abspath(w),
              "test") for w in eval_wavs]

    splits = {
        "train_nodev": utts[args.num_dev:],
        "dev": utts[: args.num_dev],
        "eval": evals or utts[: args.num_dev],  # fall back when no Test_set
    }
    for name, items in splits.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as f:
            for utt, wav, _ in items:
                f.write(f"{utt} {wav}\n")
        with open(os.path.join(d, "utt2spk"), "w") as f:
            for utt, _, spk in items:
                f.write(f"{utt} {spk}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
