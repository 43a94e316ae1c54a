"""Objective evaluation CLI: F0 metrics (log-F0 RMSE, semitone acc, VUV).

Behavioral reference: /root/reference/parallel_wavegan/bin/evaluate_f0.py
(pyworld Harvest F0 + DTW + multiprocess fan-out). F0 here defaults to
the numpy Harvest implementation (ops/harvest.py — the same algorithm
the reference invokes via pyworld, so absolute numbers are comparable);
--tracker yin keeps the lighter YIN path. Alignment is mel-cepstral DTW
as in evaluate_mcd.
"""

from __future__ import annotations

import argparse
import fnmatch
import logging
import multiprocessing as mp
import os

import numpy as np

from parallelwavegan_tpu.ops.metrics import f0_metrics
from parallelwavegan_tpu.utils.io import read_wav_entry, wav_index


def _evaluate_one(args_tuple):
    utt_id, gen_entry, gt_entry, f0min, f0max, tracker = args_tuple
    fs_gen, gen = read_wav_entry(gen_entry)
    fs_gt, gt = read_wav_entry(gt_entry)
    assert fs_gen == fs_gt, f"{utt_id}: fs mismatch"
    m = f0_metrics(gen, gt, fs_gen, f0min=f0min, f0max=f0max,
                   tracker=tracker)
    return utt_id, m


def main():
    parser = argparse.ArgumentParser(description="Evaluate F0 metrics.")
    parser.add_argument("--wavdir", type=str, required=True,
                        help="directory of generated wavs, or a wav.scp "
                             "(optional sibling segments file)")
    parser.add_argument("--gt-wavdir", type=str, required=True,
                        help="directory of ground-truth wavs, or a wav.scp "
                             "(optional sibling segments file)")
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--f0min", type=float, default=40.0)
    parser.add_argument("--f0max", type=float, default=800.0)
    parser.add_argument("--tracker", type=str, default="harvest",
                        choices=["harvest", "yin"],
                        help="F0 estimator (harvest matches the "
                             "reference's pyworld extractor family)")
    parser.add_argument("--n_jobs", type=int, default=8)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    gen_index = wav_index(args.wavdir, "*_gen.wav") or wav_index(args.wavdir)
    gt_index = wav_index(args.gt_wavdir)
    pairs = []
    for utt, gen_entry in sorted(gen_index.items()):
        utt = utt.removesuffix("_gen")
        match = gt_index.get(utt) or next(
            (v for k, v in gt_index.items() if fnmatch.fnmatch(k, f"{utt}*")),
            None,
        )
        if match is None:
            logging.warning("no ground truth for %s; skipped.", utt)
            continue
        pairs.append((utt, gen_entry, match, args.f0min, args.f0max,
                      args.tracker))
    logging.info("number of utterances = %d", len(pairs))

    with mp.Pool(args.n_jobs) as pool:
        results = pool.map(_evaluate_one, pairs)
    results.sort(key=lambda r: r[0])

    keys = ["log_f0_rmse", "semitone_acc", "vuv_error_rate"]
    summary = {}
    for k in keys:
        vals = np.array([r[1][k] for r in results], dtype=np.float64)
        vals = vals[np.isfinite(vals)]
        summary[k] = (float(vals.mean()) if len(vals) else float("nan"),
                      float(vals.std()) if len(vals) else float("nan"))
        logging.info("%s: %.4f +- %.4f", k, *summary[k])

    if args.outdir is not None:
        os.makedirs(args.outdir, exist_ok=True)
        with open(os.path.join(args.outdir, "utt2f0"), "w") as f:
            for utt_id, m in results:
                f.write(
                    f"{utt_id} "
                    + " ".join(f"{m[k]:.4f}" for k in keys)
                    + "\n"
                )
        with open(os.path.join(args.outdir, "avg_f0"), "w") as f:
            for k in keys:
                f.write(f"{k} {summary[k][0]:.4f} +- {summary[k][1]:.4f}\n")
        logging.info("Saved results to %s.", args.outdir)


if __name__ == "__main__":
    main()
