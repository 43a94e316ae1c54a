#!/usr/bin/env python3
"""M4Singer data prep: meta.json-driven multi-singer split.

Behavioral reference: /root/reference/egs/m4singer/voc1/local/data_prep.py
(item_name "<singer>#<song>#<sent>"; wav at <singer>#<song>/<sent>.wav;
seeded shuffle split; per-sentence wavs so no segments are needed).
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "utils"))
from singing_data_prep import resample_wav  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--num-dev", type=int, default=50)
    parser.add_argument("--num-eval", type=int, default=50)
    parser.add_argument("--seed", type=int, default=777)
    args = parser.parse_args()

    with open(os.path.join(args.db_root, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    names = sorted({m["item_name"] for m in meta})
    random.Random(args.seed).shuffle(names)
    nd, ne = args.num_dev, args.num_eval
    split_of = {}
    for n in names[:ne]:
        split_of[n] = "eval"
    for n in names[ne : ne + nd]:
        split_of[n] = "dev"
    for n in names[ne + nd :]:
        split_of[n] = "train_nodev"

    out = {"train_nodev": [], "dev": [], "eval": []}
    dump = os.path.join(args.data_dir, f"wav{args.fs}")
    os.makedirs(dump, exist_ok=True)
    for name in names:
        singer, song, sent = name.split("#")
        wav = os.path.join(args.db_root, f"{singer}#{song}", f"{sent}.wav")
        if not os.path.exists(wav):
            print(f"missing {wav}; skipped")
            continue
        utt = "m4singer_" + name.replace("#", "_").replace(" ", "-")
        dst = os.path.join(dump, utt + ".wav")
        if not os.path.exists(dst):
            resample_wav(wav, dst, args.fs)
        out[split_of[name]].append((utt, os.path.abspath(dst), singer))

    for name, items in out.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as f:
            for utt, wav, _ in items:
                f.write(f"{utt} {wav}\n")
        with open(os.path.join(d, "utt2spk"), "w") as f:
            for utt, _, spk in items:
                f.write(f"{utt} {spk}\n")
    print("prepared:", {k: len(v) for k, v in out.items()})


if __name__ == "__main__":
    main()
