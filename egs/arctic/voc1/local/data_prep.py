#!/usr/bin/env python3
"""CMU ARCTIC data prep: per-speaker wav.scp + lab-based trim segments.

Behavioral reference: /root/reference/egs/arctic/voc1/local/data_prep.sh
(.lab files give phone times; leading/trailing "pau" is trimmed via a
kaldi segments file).
"""

import argparse
import glob
import os


def lab_span(lab_path):
    """Return (start, end) of non-pau speech from a festival .lab file."""
    times = []
    with open(lab_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3 and parts[0] != "#":
                times.append((float(parts[0]), parts[2]))
    if not times:
        return None
    start = 0.0
    for t, phn in times:
        if phn != "pau":
            break
        start = t
    end = times[-1][0]
    for t, phn in reversed(times):
        if phn != "pau":
            break
        end = t
    return start, end


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="e.g. downloads/cmu_us_slt_arctic")
    parser.add_argument("spk")
    parser.add_argument("data_dir")
    parser.add_argument("--num-dev", type=int, default=100)
    parser.add_argument("--num-eval", type=int, default=100)
    args = parser.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.db_root, "wav", "*.wav")))
    assert wavs, f"no wavs under {args.db_root}/wav"
    utts = []
    for w in wavs:
        stem = os.path.splitext(os.path.basename(w))[0]
        lab = os.path.join(args.db_root, "lab", stem + ".lab")
        span = lab_span(lab) if os.path.exists(lab) else None
        utts.append((f"{args.spk}_{stem}", os.path.abspath(w), span))

    nd, ne = args.num_dev, args.num_eval
    splits = {
        f"train_nodev_{args.spk}": utts[: -(nd + ne)],
        f"dev_{args.spk}": utts[-(nd + ne) : -ne],
        f"eval_{args.spk}": utts[-ne:],
    }
    for name, items in splits.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as f:
            for utt, wav, _ in items:
                f.write(f"{utt} {wav}\n")
        with open(os.path.join(d, "utt2spk"), "w") as f:
            for utt, _, _ in items:
                f.write(f"{utt} {args.spk}\n")
        segs = [(u, w, s) for u, w, s in items if s is not None]
        if segs:
            with open(os.path.join(d, "segments"), "w") as f:
                for utt, _, (start, end) in segs:
                    f.write(f"{utt}_seg {utt} {start:.3f} {end:.3f}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
