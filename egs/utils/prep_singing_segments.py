#!/usr/bin/env python3
"""Derive a kaldi ``segments`` file from phone alignment labels.

Role equivalent of the reference's per-recipe ``local/prep_segments.py``
(e.g. /root/reference/egs/kiritan/voc1/local/prep_segments.py): whole songs
are too long to train on, so they are cut at silences into segments no
longer than ``--threshold-ms``, with over-long stretches between silences
split evenly.

Input: a data dir containing ``wav.scp`` and ``label`` where each label
line is ``<rec_id> (<start_sec> <end_sec> <phone>)+``.

Output (in place): ``segments`` (utt rec start end), ``utt2spk`` expanded
per segment when present, and the original wav.scp left untouched.
"""

import argparse
import math
import os


def split_span(entries, max_dur):
    """Split a run of (start, end) label entries into <= max_dur chunks."""
    span_start, span_end = entries[0][0], entries[-1][1]
    n_chunks = max(1, math.ceil((span_end - span_start) / max_dur))
    if n_chunks == 1:
        return [(span_start, span_end)]
    target = (span_end - span_start) / n_chunks
    chunks, chunk_start, prev_end = [], span_start, span_start
    for start, end in entries:
        if end - chunk_start > target and prev_end > chunk_start:
            chunks.append((chunk_start, prev_end))
            chunk_start = start
        prev_end = end
    chunks.append((chunk_start, span_end))
    return chunks


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", help="dir with wav.scp and label")
    parser.add_argument("--threshold-ms", type=int, default=10000,
                        help="max segment duration in milliseconds")
    parser.add_argument("--silence", action="append", default=None,
                        help="silence phone symbol(s); default pau/sil/br")
    parser.add_argument("--min-dur", type=float, default=0.1,
                        help="drop segments shorter than this (seconds)")
    args = parser.parse_args()
    sil = set(args.silence or ["pau", "sil", "br"])
    max_dur = args.threshold_ms / 1000.0

    label_path = os.path.join(args.data_dir, "label")
    utt2spk_path = os.path.join(args.data_dir, "utt2spk")
    spk = {}
    if os.path.exists(utt2spk_path):
        with open(utt2spk_path) as f:
            spk = dict(line.split() for line in f if line.strip())

    segments, utt2spk_out = [], []
    with open(label_path) as f:
        for line in f:
            parts = line.split()
            rec, toks = parts[0], parts[1:]
            assert len(toks) % 3 == 0, f"malformed label line for {rec}"
            # contiguous non-silence runs
            runs, cur = [], []
            for i in range(0, len(toks), 3):
                start, end, phone = float(toks[i]), float(toks[i + 1]), toks[i + 2]
                if phone in sil:
                    if cur:
                        runs.append(cur)
                        cur = []
                else:
                    cur.append((start, end))
            if cur:
                runs.append(cur)
            n = 0
            for run in runs:
                for start, end in split_span(run, max_dur):
                    if end - start < args.min_dur:
                        continue
                    utt = f"{rec}_{n:04d}"
                    segments.append((utt, rec, start, end))
                    if rec in spk:
                        utt2spk_out.append((utt, spk[rec]))
                    n += 1

    with open(os.path.join(args.data_dir, "segments"), "w") as f:
        for utt, rec, start, end in segments:
            f.write(f"{utt} {rec} {start:.3f} {end:.3f}\n")
    if utt2spk_out:
        with open(utt2spk_path, "w") as f:
            for utt, s in utt2spk_out:
                f.write(f"{utt} {s}\n")
    print(f"wrote {len(segments)} segments for {args.data_dir}")


if __name__ == "__main__":
    main()
