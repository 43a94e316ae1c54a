#!/usr/bin/env python3
"""LibriTTS-R multi-speaker data prep (layout: <part>/<spk>/<chapter>/*.wav): emit wav.scp + utt2spk + spk2idx."""

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

    # EDIT HERE: assumes <db_root>/<speaker>/*.wav layout
    wavs = sorted(glob.glob(os.path.join(args.db_root, "*", "*", "*.wav")))
    assert wavs, f"no wavs under {args.db_root}"
    utts = []
    for w in wavs:
        spk = os.path.basename(os.path.dirname(w))
        utt_id = f"{spk}_{os.path.splitext(os.path.basename(w))[0]}"
        utts.append((utt_id, os.path.abspath(w), spk))

    spks = sorted({spk for _, _, spk in utts})
    os.makedirs(args.data_dir, exist_ok=True)
    with open(os.path.join(args.data_dir, "spk2idx"), "w") as f:
        for i, spk in enumerate(spks):
            f.write(f"{spk} {i}\n")

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
            for utt_id, wav, _ in items:
                f.write(f"{utt_id} {wav}\n")
        with open(os.path.join(d, "utt2spk"), "w") as f:
            for utt_id, _, spk in items:
                f.write(f"{utt_id} {spk}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
