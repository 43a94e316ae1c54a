#!/usr/bin/env python3
"""CSD (Children's Song Dataset) data prep: csv note alignments -> label.

Behavioral reference: /root/reference/egs/csd/voc1/local/dataset_split.py
(+ prep_segments.py). The csv rows (start,end,pitch,syllable) become a
phone-label stream; inter-note gaps > 50 ms are written as explicit
"sil" entries so the shared segmenter can split on them.
"""

import argparse
import csv
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "utils"))
from singing_data_prep import resample_wav  # noqa: E402

DEV_SONGS = ["046"]
EVAL_SONGS = ["047", "048", "049", "050"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="CSD root (with english/ korean/)")
    parser.add_argument("data_dir")
    parser.add_argument("--lang", default="english",
                        choices=["english", "korean"])
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--gap-sil", type=float, default=0.05)
    args = parser.parse_args()

    root = os.path.join(args.db_root, args.lang)
    wavs = sorted(glob.glob(os.path.join(root, "wav", "*.wav")))
    assert wavs, f"no wavs under {root}/wav"

    splits = {"train_nodev": [], "dev": [], "eval": []}
    for wav in wavs:
        sid = os.path.splitext(os.path.basename(wav))[0]
        num = sid[-3:]
        csv_path = os.path.join(root, "csv", sid + ".csv")
        if not os.path.exists(csv_path):
            print(f"no csv for {wav}; skipped")
            continue
        entries, prev_end = [], None
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                start, end = float(row["start"]), float(row["end"])
                syb = row.get("syllable") or row.get("lyric") or "note"
                if prev_end is not None and start - prev_end > args.gap_sil:
                    entries.append((prev_end, start, "sil"))
                entries.append((start, end, syb.replace(" ", "_")))
                prev_end = end
        name = ("dev" if num in DEV_SONGS
                else "eval" if num in EVAL_SONGS else "train_nodev")
        splits[name].append((f"csd_{args.lang}_{sid}", wav, entries))

    for name, items in splits.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        dump = os.path.join(args.data_dir, f"wav{args.fs}")
        os.makedirs(dump, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as fw, \
                open(os.path.join(d, "utt2spk"), "w") as fu, \
                open(os.path.join(d, "label"), "w") as fl:
            for rec, wav, entries in items:
                dst = os.path.join(dump, rec + ".wav")
                if not os.path.exists(dst):
                    resample_wav(wav, dst, args.fs)
                fw.write(f"{rec} {os.path.abspath(dst)}\n")
                fu.write(f"{rec} csd_{args.lang}\n")
                flat = " ".join(f"{s:.4f} {e:.4f} {p}" for s, e, p in entries)
                fl.write(f"{rec} {flat}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
