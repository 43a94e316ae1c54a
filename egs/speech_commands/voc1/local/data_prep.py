#!/usr/bin/env python3
"""Speech Commands data prep: one wav.scp over all class subdirs.

Behavioral reference:
/root/reference/egs/speech_commands/voc1/local/data_prep.sh.
"""

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--num-dev", type=int, default=250)
    parser.add_argument("--num-eval", type=int, default=250)
    args = parser.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.db_root, "*", "*.wav")))
    wavs = [w for w in wavs if "_background_noise_" not in w]
    assert wavs, f"no wavs under {args.db_root}"
    utts = []
    for w in wavs:
        cls = os.path.basename(os.path.dirname(w))
        stem = os.path.splitext(os.path.basename(w))[0]
        utts.append((f"{cls}_{stem}", os.path.abspath(w)))

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
            for utt, wav in items:
                f.write(f"{utt} {wav}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
