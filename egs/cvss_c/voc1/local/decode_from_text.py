#!/usr/bin/env python3
"""Decode a kaldi-style text file of discrete unit ids with a trained
discrete-symbol vocoder (TPU-native twin of the reference's
egs/cvss_c/voc1/local/decode_from_text.py).

Each line of --text is ``utt_id u1 u2 u3 ...``; consecutive duplicate
units are collapsed into (code, run-length) pairs. With a
DiscreteSymbolDurationGenerator checkpoint the run lengths are the
ground-truth durations (--gt-duration) or re-predicted by the model's
duration predictor (default, matching the reference's flag semantics).
Optional --utt2spk/--spk2idx map utterances to global speaker ids,
carried as the tokens' second column.
"""

import argparse
import logging
import os
import time

import numpy as np
import yaml


def _read_kv(path):
    with open(path) as f:
        return dict(line.split(None, 1) for line in
                    (ln.strip() for ln in f) if line)


def main():
    parser = argparse.ArgumentParser(
        description="Decode discrete-unit text with a trained vocoder.")
    parser.add_argument("--text", required=True,
                        help="kaldi-style text file of unit ids")
    parser.add_argument("--utt2spk", default=None,
                        help="kaldi-style utt2spk file")
    parser.add_argument("--spk2idx", default=None,
                        help="kaldi-style spk2idx file")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--gt-duration", "--gt_duration", default=False,
                        action="store_true", dest="gt_duration",
                        help="use run-length durations instead of the "
                             "duration predictor")
    parser.add_argument("--config", default=None,
                        help="yaml config; defaults to the checkpoint "
                             "directory's config.yml")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=(logging.DEBUG if args.verbose > 1
               else logging.INFO if args.verbose > 0 else logging.WARN),
        format="%(asctime)s (%(module)s:%(lineno)d) "
               "%(levelname)s: %(message)s",
    )

    if args.config is None:
        args.config = os.path.join(
            os.path.dirname(args.checkpoint), "config.yml")
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)

    from parallelwavegan_tpu.utils.io import write_wav
    from parallelwavegan_tpu.utils.model import load_model

    model = load_model(args.checkpoint, config)
    logging.info("Loaded model parameters from %s.", args.checkpoint)

    with open(args.text) as f:
        text = {
            parts[0]: np.array([int(t) for t in parts[1:]], dtype=np.int64)
            for parts in (line.split() for line in f) if parts
        }

    utt2idx = None
    if args.utt2spk is not None:
        assert args.spk2idx is not None, "--utt2spk needs --spk2idx"
        utt2spk = _read_kv(args.utt2spk)
        spk2idx = {k: int(v) for k, v in _read_kv(args.spk2idx).items()}
        utt2idx = {u: spk2idx[s.strip()] for u, s in utt2spk.items()}

    os.makedirs(args.outdir, exist_ok=True)
    fs = config["sampling_rate"]
    is_duration = (
        config.get("generator_type") == "DiscreteSymbolDurationGenerator")

    total_rtf = 0.0
    idx = 0
    for idx, (utt_id, units) in enumerate(text.items(), 1):
        if len(units) == 0:
            logging.warning("skipping %s: no units", utt_id)
            continue
        # collapse consecutive duplicates -> (codes, run lengths)
        change = np.flatnonzero(np.diff(units)) + 1
        starts = np.concatenate([[0], change])
        codes = units[starts]
        ds = np.diff(np.concatenate([starts, [len(units)]]))

        c = codes[:, None]
        if utt2idx is not None:
            spk = np.full_like(c, utt2idx[utt_id])
            c = np.concatenate([c, spk], axis=1)

        start = time.time()
        if is_duration and args.gt_duration:
            y = model.inference(c, ds=ds)
        elif is_duration:
            y = model.inference(c)
        else:
            # plain discrete vocoder consumes the uncollapsed unit stream
            cu = units[:, None]
            if utt2idx is not None:
                cu = np.concatenate(
                    [cu, np.full_like(cu, utt2idx[utt_id])], axis=1)
            y = model.inference(cu)
        y = np.asarray(y)[:, 0]
        rtf = (time.time() - start) / (len(y) / fs)
        total_rtf += rtf
        write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"), fs, y)

    logging.info("Finished generation of %d utterances (RTF = %.03f).",
                 idx, total_rtf / max(idx, 1))


if __name__ == "__main__":
    main()
