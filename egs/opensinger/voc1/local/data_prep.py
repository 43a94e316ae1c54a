#!/usr/bin/env python3
"""OpenSinger data prep: ManRaw/WomanRaw multi-singer split.

Behavioral reference:
/root/reference/egs/opensinger/voc1/local/data_prep.sh (per-speaker
shuffled dev/eval carve-out; wavs resampled/downmixed to the target fs).
"""

import argparse
import glob
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "utils"))
from singing_data_prep import resample_wav  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="dir with ManRaw/ WomanRaw/")
    parser.add_argument("data_dir")
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--num-dev", type=int, default=5)
    parser.add_argument("--num-eval", type=int, default=5)
    parser.add_argument("--seed", type=int, default=777)
    args = parser.parse_args()

    by_spk = {}
    for gender in ["ManRaw", "WomanRaw"]:
        for w in sorted(glob.glob(os.path.join(args.db_root, gender,
                                               "*", "*.wav"))):
            stem = os.path.splitext(os.path.basename(w))[0]
            spk = f"{gender[:-3]}_{stem.split('_')[0]}"
            by_spk.setdefault(spk, []).append((stem, w))

    assert by_spk, f"no wavs under {args.db_root}"
    rng = random.Random(args.seed)
    splits = {"train_nodev": [], "dev": [], "eval": []}
    for spk, items in sorted(by_spk.items()):
        rng.shuffle(items)
        ne, nd = args.num_eval, args.num_dev
        for stem, w in items[:ne]:
            splits["eval"].append((stem, w, spk))
        for stem, w in items[ne : ne + nd]:
            splits["dev"].append((stem, w, spk))
        for stem, w in items[ne + nd :]:
            splits["train_nodev"].append((stem, w, spk))

    dump = os.path.join(args.data_dir, f"wav{args.fs}")
    os.makedirs(dump, exist_ok=True)
    for name, items in splits.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as fw, \
                open(os.path.join(d, "utt2spk"), "w") as fu:
            for stem, wav, spk in sorted(items):
                utt = f"opensinger_{spk}_{stem}"
                dst = os.path.join(dump, utt + ".wav")
                if not os.path.exists(dst):
                    resample_wav(wav, dst, args.fs)
                fw.write(f"{utt} {os.path.abspath(dst)}\n")
                fu.write(f"{utt} {spk}\n")
        print(name, len(items))


if __name__ == "__main__":
    main()
