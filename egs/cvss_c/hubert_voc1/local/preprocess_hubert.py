#!/usr/bin/env python3
"""Dump CVSS-C waves + HuBERT unit ids into the training feature layout.

Role of the reference's cvss_c/local/preprocess_hubert.py: for each
utterance write {wave, feats} where 'feats' holds the per-frame discrete
unit ids (shape (T', 1), int) — symbol 0 is reserved as padding by the
duration generator, so ids are stored 1-based like the reference.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.data.datasets import AudioSCPDataset
from parallelwavegan_tpu.utils.io import write_hdf5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--wav-scp", required=True)
    parser.add_argument("--units", required=True,
                        help='text file: "utt_id u1 u2 u3 ..."')
    parser.add_argument("--dumpdir", required=True)
    args = parser.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)
    hop = config["hop_size"]

    units = {}
    with open(args.units) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            units[parts[0]] = np.asarray(
                [int(u) + 1 for u in parts[1:]], np.int32
            )  # 1-based; 0 = padding

    dataset = AudioSCPDataset(args.wav_scp, return_utt_id=True,
                              return_sampling_rate=True)
    os.makedirs(args.dumpdir, exist_ok=True)
    for i in tqdm(range(len(dataset))):
        utt_id, (audio, fs) = dataset[i]
        if utt_id not in units:
            continue
        ids = units[utt_id][:, None].astype(np.float32)
        audio = audio[: len(ids) * hop]
        if len(audio) < len(ids) * hop:
            audio = np.pad(audio, (0, len(ids) * hop - len(audio)),
                           mode="edge")
        path = os.path.join(args.dumpdir, f"{utt_id}.h5")
        write_hdf5(path, "wave", audio.astype(np.float32))
        write_hdf5(path, "feats", ids)


if __name__ == "__main__":
    main()
