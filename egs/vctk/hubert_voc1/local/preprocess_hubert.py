#!/usr/bin/env python3
"""Dump VCTK waves + HuBERT unit ids (+ speaker ids) for training.

Role of the reference's vctk/hubert_voc1/local/preprocess_hubert.py: for
each utterance write {wave, feats} where 'feats' holds per-frame discrete
unit ids, with the speaker index in a second column when --utt2spk/
--spk2idx are given (DiscreteSymbol* models take c of shape (T, 2) with
the speaker id in channel 1).
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
    parser.add_argument("--utt2spk", default=None)
    parser.add_argument("--spk2idx", default=None)
    parser.add_argument("--id-offset", type=int, default=0,
                        help="added to unit ids (1 reserves 0 as padding "
                             "for the duration generator)")
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
                [int(u) + args.id_offset for u in parts[1:]], np.int32
            )

    spk_of = None
    if args.utt2spk is not None:
        with open(args.utt2spk) as f:
            utt2spk = dict(line.split() for line in f if line.strip())
        with open(args.spk2idx) as f:
            spk2idx = {
                s: int(i) for s, i in (line.split() for line in f if line.strip())
            }
        spk_of = {u: spk2idx[s] for u, s in utt2spk.items()}

    dataset = AudioSCPDataset(args.wav_scp, return_utt_id=True,
                              return_sampling_rate=True)
    os.makedirs(args.dumpdir, exist_ok=True)
    n = 0
    for i in tqdm(range(len(dataset))):
        utt_id, (audio, fs) = dataset[i]
        if utt_id not in units:
            continue
        ids = units[utt_id][:, None].astype(np.float32)
        if spk_of is not None:
            spk = np.full_like(ids, float(spk_of[utt_id]))
            ids = np.concatenate([ids, spk], axis=1)
        audio = audio[: len(ids) * hop]
        if len(audio) < len(ids) * hop:
            audio = np.pad(audio, (0, len(ids) * hop - len(audio)),
                           mode="edge")
        path = os.path.join(args.dumpdir, f"{utt_id}.h5")
        write_hdf5(path, "wave", audio.astype(np.float32))
        write_hdf5(path, "feats", ids)
        n += 1
    print(f"dumped {n} utterances to {args.dumpdir}")


if __name__ == "__main__":
    main()
