"""Decoding CLI (`parallel-wavegan-decode`).

Behavioral reference: /root/reference/parallel_wavegan/bin/decode.py
(config discovery from the checkpoint dir :124-129, load_model +
remove_weight_norm + eval :140-149, per-utterance inference with RTF
accounting :214-235, 16-bit PCM output :238-243, --normalize-before using
registered stats :144-146).

TPU design: inference runs through InferenceModel's bucketed jitted
forward, so the whole dev set hits a handful of compiled programs; RTF is
measured with block_until_ready semantics (device_get inside inference).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.data.datasets import (
    MelDataset,
    MelF0ExcitationDataset,
    MelSCPDataset,
)
from parallelwavegan_tpu.utils.io import read_hdf5, write_wav
from parallelwavegan_tpu.utils.model import load_model


def main():
    parser = argparse.ArgumentParser(description="Decode with a trained vocoder.")
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--dumpdir", default=None, type=str)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--normalize-before", default=False, action="store_true")
    parser.add_argument("--use-f0-and-excitation", default=False,
                        action="store_true")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config = None
    if args.config is not None:
        with open(args.config) as f:
            config = yaml.load(f, Loader=yaml.SafeLoader)
    else:
        dirname = os.path.dirname(args.checkpoint)
        with open(os.path.join(dirname, "config.yml")) as f:
            config = yaml.load(f, Loader=yaml.SafeLoader)

    if (args.feats_scp is not None) == (args.dumpdir is not None):
        raise ValueError("Please specify either --dumpdir or --feats-scp.")

    fmt = config.get("format", "hdf5")
    if args.dumpdir is not None:
        if fmt == "hdf5":
            mel_query = "*.h5"
            mel_load_fn = lambda x: read_hdf5(x, "feats")  # noqa: E731
        elif fmt == "npy":
            mel_query = "*-feats.npy"
            mel_load_fn = np.load
        else:
            raise ValueError("Support only hdf5 or npy format.")
        if args.use_f0_and_excitation:
            dataset = MelF0ExcitationDataset(
                args.dumpdir, mel_query=mel_query, mel_load_fn=mel_load_fn,
                return_utt_id=True,
            )
        else:
            dataset = MelDataset(
                args.dumpdir, mel_query=mel_query, mel_load_fn=mel_load_fn,
                return_utt_id=True,
            )
    else:
        dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)
    logging.info("The number of features to be decoded = %d.", len(dataset))

    model = load_model(args.checkpoint, config)
    logging.info("Loaded model parameters from %s.", args.checkpoint)

    os.makedirs(args.outdir, exist_ok=True)
    fs = config["sampling_rate"]
    total_rtf = 0.0
    pbar = tqdm(range(len(dataset)))
    for i in pbar:
        item = dataset[i]
        utt_id, c = item[0], item[1]
        start = time.time()
        y = model.inference(c, normalize_before=args.normalize_before)
        y = np.asarray(y)[:, 0]
        rtf = (time.time() - start) / (len(y) / fs)
        pbar.set_postfix({"RTF": rtf})
        total_rtf += rtf
        write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"), fs, y)

    logging.info(
        "Finished generation of %d utterances (RTF = %.06f).",
        len(dataset), total_rtf / max(len(dataset), 1),
    )


if __name__ == "__main__":
    main()
