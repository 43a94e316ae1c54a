"""Objective evaluation CLI: mel-cepstral distortion.

Behavioral reference: /root/reference/parallel_wavegan/bin/evaluate_mcd.py
(pysptk mcep + fastdtw + multiprocess fan-out; fs-dependent mcep params
:106-118). Invoked as ``python -m parallelwavegan_tpu.bin.evaluate_mcd``
like the reference recipe stage 4 (egs/m4singer/voc1/run.sh:188).
"""

from __future__ import annotations

import argparse
import fnmatch
import logging
import multiprocessing as mp
import os

import numpy as np

from parallelwavegan_tpu.ops.metrics import mel_cepstral_distortion
from parallelwavegan_tpu.utils.io import read_wav_entry, wav_index


def _evaluate_one(pair):
    utt_id, gen_entry, gt_entry, opts = pair
    fs_gen, gen = read_wav_entry(gen_entry)
    fs_gt, gt = read_wav_entry(gt_entry)
    assert fs_gen == fs_gt, f"{utt_id}: fs mismatch"
    mcd = mel_cepstral_distortion(gen, gt, fs_gen, **opts)
    return utt_id, mcd


def main():
    parser = argparse.ArgumentParser(description="Evaluate MCD (gen vs GT).")
    parser.add_argument("--wavdir", type=str, required=True,
                        help="directory with generated *_gen.wav files, or a "
                             "wav.scp (optional sibling segments file)")
    parser.add_argument("--gt-wavdir", type=str, required=True,
                        help="directory with ground-truth wavs, or a wav.scp "
                             "(optional sibling segments file)")
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--n_fft", type=int, default=1024)
    parser.add_argument("--n_shift", type=int, default=256)
    parser.add_argument("--mcep_dim", type=int, default=None,
                        help="mel-cepstrum order (default: fs-dependent)")
    parser.add_argument("--mcep_alpha", type=float, default=None,
                        help="all-pass alpha (default: fs-dependent)")
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
        pairs.append((utt, gen_entry, match, {
            "n_fft": args.n_fft, "n_shift": args.n_shift,
            "mcep_dim": args.mcep_dim, "mcep_alpha": args.mcep_alpha,
        }))
    logging.info("number of utterances = %d", len(pairs))

    with mp.Pool(args.n_jobs) as pool:
        results = pool.map(_evaluate_one, pairs)

    results.sort(key=lambda r: r[0])
    mcds = np.array([r[1] for r in results])
    mean_mcd, std_mcd = float(np.mean(mcds)), float(np.std(mcds))
    logging.info("Average: %.4f +- %.4f", mean_mcd, std_mcd)

    if args.outdir is not None:
        os.makedirs(args.outdir, exist_ok=True)
        with open(os.path.join(args.outdir, "utt2mcd"), "w") as f:
            for utt_id, mcd in results:
                f.write(f"{utt_id} {mcd:.4f}\n")
        with open(os.path.join(args.outdir, "avg_mcd"), "w") as f:
            f.write(f"{mean_mcd:.4f} +- {std_mcd:.4f}\n")
        logging.info("Saved results to %s.", args.outdir)


if __name__ == "__main__":
    main()
