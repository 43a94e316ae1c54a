#!/usr/bin/env python3
"""VCTK discrete-unit recipe data prep: wav.scp + utt2spk + spk2idx.

Behavioral reference: /root/reference/egs/vctk/hubert_voc1/local/
data_prep.sh (wav48/<spk>/*.wav; utterances without HuBERT units are
dropped at preprocess time).
"""

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="VCTK root with wav48/")
    parser.add_argument("data_dir")
    parser.add_argument("--num-dev", type=int, default=100)
    parser.add_argument("--num-eval", type=int, default=100)
    args = parser.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.db_root, "wav48", "*", "*.wav")))
    assert wavs, f"no wavs under {args.db_root}/wav48"
    utts = []
    for w in wavs:
        spk = os.path.basename(os.path.dirname(w))
        stem = os.path.splitext(os.path.basename(w))[0]
        utts.append((stem if stem.startswith(spk) else f"{spk}_{stem}",
                     os.path.abspath(w), spk))

    spks = sorted({s for _, _, s in utts})
    os.makedirs(args.data_dir, exist_ok=True)
    with open(os.path.join(args.data_dir, "spk2idx"), "w") as f:
        for i, s in enumerate(spks):
            f.write(f"{s} {i}\n")

    nd, ne = args.num_dev, args.num_eval
    splits = {
        "train_nodev": utts[: -(nd + ne)],
        "dev": utts[-(nd + ne) : -ne],
        "eval": utts[-ne:],
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
