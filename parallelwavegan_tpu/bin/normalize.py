"""Feature-normalization CLI (`parallel-wavegan-normalize`).

Behavioral reference: /root/reference/parallel_wavegan/bin/normalize.py
(scaler restore :237-248, per-utterance transform :270, wave copied
alongside, --target-feats feats|local, per-speaker stats via utt2spk,
f0/excitation copied through for UHiFiGAN :128-162,:286-296, global
condition copied through :303-306, binary local features left
unnormalized :332-337).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.data.datasets import (
    AudioMelDataset,
    AudioMelF0ExcitationDataset,
    AudioMelSCPDataset,
)
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
    use_f0_and_excitation = config.get("generator_type") == "UHiFiGANGenerator"
    use_global = config.get("use_global_condition", False)
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
        if use_f0_and_excitation:
            extra = {} if fmt == "hdf5" else dict(
                f0_query="*-f0.npy",
                f0_load_fn=np.load,
                excitation_query="*-excitation.npy",
                excitation_load_fn=np.load,
            )
            dataset = AudioMelF0ExcitationDataset(
                args.rootdir,
                audio_query=audio_query,
                audio_load_fn=audio_load_fn,
                mel_query=mel_query,
                mel_load_fn=mel_load_fn,
                return_utt_id=True,
                **extra,
            )
        else:
            gq, gl = None, None
            if use_global:
                if fmt == "hdf5":
                    gq = "*.h5"
                    gl = lambda x: read_hdf5(x, "global")  # noqa: E731
                else:
                    gq, gl = "*-global.npy", np.load
            dataset = AudioMelDataset(
                args.rootdir,
                audio_query=audio_query,
                audio_load_fn=audio_load_fn,
                mel_query=mel_query,
                mel_load_fn=mel_load_fn,
                global_query=gq,
                global_load_fn=gl,
                return_utt_id=True,
            )
    else:
        if use_f0_and_excitation or use_global:
            raise NotImplementedError(
                "SCP format is not supported for f0/excitation or "
                "global conditioning."
            )
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
        f0 = excitation = g = None
        if use_f0_and_excitation:
            utt_id, audio, mel, f0, excitation = dataset[i]
        elif use_global:
            utt_id, audio, mel, g = dataset[i]
        else:
            utt_id, audio, mel = dataset[i]
        m, s = mean, scale
        if utt2spk is not None:
            spk = utt2spk[utt_id]
            if spk not in spk_stats_cache:
                spk_stats_cache[spk] = load_stats(spk)
            m, s = spk_stats_cache[spk]
        mel_norm = (mel - m) / s
        if tf == "local":
            # binary channels (e.g. voiced/unvoiced flags) pass through
            # unnormalized (reference normalize.py:332-337)
            is_binary = (
                np.logical_or(mel == 1, mel == 0).sum(axis=0) == len(mel)
            )
            mel_norm[:, is_binary] = mel[:, is_binary]
        mel = mel_norm
        if fmt == "hdf5":
            path = os.path.join(args.dumpdir, f"{utt_id}.h5")
            write_hdf5(path, tf, mel.astype(np.float32))
            if f0 is not None:
                write_hdf5(path, "f0", f0.astype(np.float32))
                write_hdf5(path, "excitation", excitation.astype(np.float32))
            if g is not None:
                write_hdf5(path, "global", np.asarray(g).reshape(-1))
            if not args.skip_wav_copy:
                write_hdf5(path, "wave", np.asarray(audio, dtype=np.float32))
        else:
            np.save(
                os.path.join(args.dumpdir, f"{utt_id}-{tf}.npy"),
                mel.astype(np.float32),
                allow_pickle=False,
            )
            if f0 is not None:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-f0.npy"),
                    f0.astype(np.float32),
                    allow_pickle=False,
                )
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-excitation.npy"),
                    excitation.astype(np.float32),
                    allow_pickle=False,
                )
            if g is not None:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-global.npy"),
                    np.asarray(g).reshape(-1),
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
