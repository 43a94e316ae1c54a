"""Feature-normalization CLI (`parallel-wavegan-normalize`).

Behavioral reference: /root/reference/parallel_wavegan/bin/normalize.py
(scaler restore :237-248, per-utterance transform :270, wave copied
alongside, --target-feats feats|local, per-speaker stats via utt2spk).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.data.datasets import AudioMelDataset, AudioMelSCPDataset
from parallelwavegan_tpu.utils.io import read_hdf5, write_hdf5


def main():
    parser = argparse.ArgumentParser(description="Normalize dumped features.")
    parser.add_argument("--wav-scp", "--scp", default=None, type=str)
    parser.add_argument("--feats-scp", default=None, type=str)
    parser.add_argument("--segments", default=None, type=str)
    parser.add_argument("--rootdir", default=None, type=str)
    parser.add_argument("--dumpdir", type=str, required=True)
    parser.add_argument("--stats", type=str, required=True)
    parser.add_argument("--skip-wav-copy", default=False, action="store_true")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--target-feats", type=str, default="feats",
                        choices=["feats", "local"])
    parser.add_argument("--utt2spk", default=None, type=str)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)

    if (args.feats_scp is not None) == (args.rootdir is not None):
        raise ValueError("Please specify either --rootdir or --feats-scp.")

    fmt = config.get("format", "hdf5")
    tf = args.target_feats
    if args.rootdir is not None:
        if fmt == "hdf5":
            audio_query, mel_query = "*.h5", "*.h5"
            audio_load_fn = lambda x: read_hdf5(x, "wave")  # noqa: E731
            mel_load_fn = lambda x: read_hdf5(x, tf)  # noqa: E731
        elif fmt == "npy":
            audio_query, mel_query = "*-wave.npy", f"*-{tf}.npy"
            audio_load_fn = np.load
            mel_load_fn = np.load
        else:
            raise ValueError("support only hdf5 or npy format.")
        dataset = AudioMelDataset(
            args.rootdir,
            audio_query=audio_query,
            audio_load_fn=audio_load_fn,
            mel_query=mel_query,
            mel_load_fn=mel_load_fn,
            return_utt_id=True,
        )
    else:
        dataset = AudioMelSCPDataset(
            args.wav_scp, args.feats_scp, segments=args.segments,
            return_utt_id=True,
        )

    utt2spk = None
    if args.utt2spk is not None:
        utt2spk = {}
        with open(args.utt2spk) as f:
            for line in f:
                utt, spk = line.split()
                utt2spk[utt] = spk

    def load_stats(spk=None):
        if args.stats.endswith(".h5"):
            prefix = f"{spk}/" if spk else ""
            mean = read_hdf5(args.stats, prefix + "mean").reshape(-1)
            scale = read_hdf5(args.stats, prefix + "scale").reshape(-1)
        else:
            path = args.stats
            if spk:
                path = args.stats.replace("stats", f"stats-{spk}")
            arr = np.load(path)
            mean, scale = arr[0].reshape(-1), arr[1].reshape(-1)
        return mean, scale

    mean, scale = load_stats()
    spk_stats_cache: dict = {}

    os.makedirs(args.dumpdir, exist_ok=True)
    for i in tqdm(range(len(dataset))):
        utt_id, audio, mel = dataset[i]
        m, s = mean, scale
        if utt2spk is not None:
            spk = utt2spk[utt_id]
            if spk not in spk_stats_cache:
                spk_stats_cache[spk] = load_stats(spk)
            m, s = spk_stats_cache[spk]
        mel = (mel - m) / s
        if fmt == "hdf5":
            path = os.path.join(args.dumpdir, f"{utt_id}.h5")
            write_hdf5(path, tf, mel.astype(np.float32))
            if not args.skip_wav_copy:
                write_hdf5(path, "wave", np.asarray(audio, dtype=np.float32))
        else:
            np.save(
                os.path.join(args.dumpdir, f"{utt_id}-{tf}.npy"),
                mel.astype(np.float32),
                allow_pickle=False,
            )
            if not args.skip_wav_copy:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-wave.npy"),
                    np.asarray(audio, dtype=np.float32),
                    allow_pickle=False,
                )


if __name__ == "__main__":
    main()
