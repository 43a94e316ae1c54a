#!/usr/bin/env python3
"""Opencpop data prep from the official transcription splits.

Behavioral reference: /root/reference/egs/opencpop/voc1/local/data_prep.py
(segments/{train,test}.txt: "uid|text|phns|notes|syb_dur|phn_dur|keep";
wavs at segments/wavs/<uid>.wav, resampled to the target fs; dev is
carved from the tail of train).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "utils"))
from singing_data_prep import resample_wav  # noqa: E402


def read_split(path):
    uids = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                uids.append(line.split("|")[0])
    return uids


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--num-dev", type=int, default=50)
    args = parser.parse_args()

    train = read_split(os.path.join(args.db_root, "segments", "train.txt"))
    test = read_split(os.path.join(args.db_root, "segments", "test.txt"))
    splits = {
        "train_nodev": train[: -args.num_dev],
        "dev": train[-args.num_dev :],
        "eval": test,
    }
    dump = os.path.join(args.data_dir, f"wav{args.fs}")
    os.makedirs(dump, exist_ok=True)
    for name, uids in splits.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as fw, \
                open(os.path.join(d, "utt2spk"), "w") as fu:
            for uid in uids:
                wav = os.path.join(args.db_root, "segments", "wavs",
                                   f"{uid}.wav")
                if not os.path.exists(wav):
                    print(f"missing {wav}; skipped")
                    continue
                dst = os.path.join(dump, f"opencpop_{uid}.wav")
                if not os.path.exists(dst):
                    resample_wav(wav, dst, args.fs)
                fw.write(f"opencpop_{uid} {os.path.abspath(dst)}\n")
                fu.write(f"opencpop_{uid} opencpop\n")
        print(name, len(uids))


if __name__ == "__main__":
    main()
