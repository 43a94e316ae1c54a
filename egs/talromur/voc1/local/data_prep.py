#!/usr/bin/env python3
"""Talromur (Icelandic, 8 voices) data prep from the official split files.

Behavioral reference: /root/reference/egs/talromur/voc1/local/data_prep.sh
(split/{spk}_{train,val,test}.txt index files: utt_id\t...\twav_path).
"""

import argparse
import os


def read_index(path):
    items = []
    with open(path) as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) >= 3:
                items.append((cols[0], cols[2]))
    return items


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="dir with split/ and per-voice wavs")
    parser.add_argument("data_dir")
    parser.add_argument("--speakers", default="a,b,c,d,e,f,g,h")
    args = parser.parse_args()

    mapping = {"train_nodev": "train", "dev": "val", "eval": "test"}
    for name, suffix in mapping.items():
        items = []
        for spk in args.speakers.split(","):
            idx = os.path.join(args.db_root, "split", f"{spk}_{suffix}.txt")
            assert os.path.exists(idx), f"missing {idx}"
            for utt, wav in read_index(idx):
                if not os.path.isabs(wav):
                    wav = os.path.join(args.db_root, wav)
                items.append((utt, wav, spk))
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as f:
            for utt, wav, _ in items:
                f.write(f"{utt} {wav}\n")
        with open(os.path.join(d, "utt2spk"), "w") as f:
            for utt, _, spk in items:
                f.write(f"{utt} {spk}\n")
        print(name, len(items))


if __name__ == "__main__":
    main()
