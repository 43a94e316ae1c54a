#!/usr/bin/env python3
"""JSSS corpus data prep: lab-trimmed short-form + long-form with segments.

Behavioral reference: /root/reference/egs/jsss/voc1/local/data_prep.sh
(short-form/simplification subsets are trimmed via .lab endpoints; the
long-form subsets ship paragraph-level transcripts with times that become
kaldi segments).
"""

import argparse
import glob
import os

SHORT_SUBSETS = [
    "short-form/basic5000",
    "short-form/onomatopee300",
    "short-form/voiceactress100",
    "simplification",
]
LONG_SUBSETS = ["long-form/katsura-masakazu", "long-form/udon", "long-form/washington-dc", "summarization"]


def lab_endpoints(lab_path):
    with open(lab_path) as f:
        lines = [line.split() for line in f if line.strip()]
    if not lines:
        return None
    return float(lines[0][1]), float(lines[-1][0])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root", help="e.g. downloads/jsss_ver1")
    parser.add_argument("data_dir")
    parser.add_argument("--num-dev", type=int, default=50)
    parser.add_argument("--num-eval", type=int, default=50)
    args = parser.parse_args()

    entries = []  # (utt, rec, wav, start, end)
    for subset in SHORT_SUBSETS:
        wavdir = os.path.join(args.db_root, subset, "wav24kHz16bit")
        for w in sorted(glob.glob(os.path.join(wavdir, "*.wav"))):
            stem = os.path.splitext(os.path.basename(w))[0]
            lab = os.path.join(args.db_root, subset, "lab", stem + ".lab")
            if not os.path.exists(lab):
                continue
            span = lab_endpoints(lab)
            if span is None:
                continue
            entries.append((stem, stem, os.path.abspath(w), span[0], span[1]))

    for subset in LONG_SUBSETS:
        wavdir = os.path.join(args.db_root, subset, "wav24kHz16bit")
        segf = os.path.join(args.db_root, subset, "transcript_utf8.txt")
        if not os.path.isdir(wavdir) or not os.path.exists(segf):
            continue
        # format: <rec>_<idx> <start> <end> <text>  (times in seconds)
        with open(segf) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 3:
                    continue
                utt, start, end = parts[0], float(parts[1]), float(parts[2])
                rec = utt.rsplit("_", 1)[0]
                wav = os.path.join(wavdir, rec + ".wav")
                if os.path.exists(wav):
                    entries.append((utt, rec, os.path.abspath(wav), start, end))

    assert entries, f"nothing found under {args.db_root}"
    nd, ne = args.num_dev, args.num_eval
    splits = {
        "train_nodev": entries[: -(nd + ne)],
        "dev": entries[-(nd + ne) : -ne],
        "eval": entries[-ne:],
    }
    for name, items in splits.items():
        d = os.path.join(args.data_dir, name)
        os.makedirs(d, exist_ok=True)
        recs = {}
        for _, rec, wav, _, _ in items:
            recs[rec] = wav
        with open(os.path.join(d, "wav.scp"), "w") as f:
            for rec, wav in sorted(recs.items()):
                f.write(f"{rec} {wav}\n")
        with open(os.path.join(d, "segments"), "w") as f:
            for utt, rec, _, start, end in items:
                f.write(f"{utt}_seg {rec} {start:.3f} {end:.3f}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
