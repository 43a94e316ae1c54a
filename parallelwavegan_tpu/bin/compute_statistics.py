"""Feature-statistics CLI (`parallel-wavegan-compute-statistics`).

Behavioral reference:
/root/reference/parallel_wavegan/bin/compute_statistics.py:146-201
(StandardScaler.partial_fit over all mels -> stats {mean, scale}, optional
per-speaker stats given utt2spk). Streaming mean/variance here is a plain
numpy two-accumulator pass (no sklearn dependency), producing identical
mean and population-std scale.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.data.datasets import MelDataset, MelSCPDataset
from parallelwavegan_tpu.utils.io import read_hdf5, write_hdf5


class StreamingScaler:
    """Streaming per-dim mean/std (sklearn StandardScaler equivalent)."""

    def __init__(self):
        self.n = 0
        self.sum = None
        self.sumsq = None

    def partial_fit(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        if self.sum is None:
            self.sum = x.sum(axis=0)
            self.sumsq = (x**2).sum(axis=0)
        else:
            self.sum += x.sum(axis=0)
            self.sumsq += (x**2).sum(axis=0)
        self.n += len(x)

    @property
    def mean_(self):
        return self.sum / self.n

    @property
    def scale_(self):
        var = self.sumsq / self.n - self.mean_**2
        return np.sqrt(np.maximum(var, 0.0))


def main():
    parser = argparse.ArgumentParser(description="Compute feature statistics.")
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--rootdir", type=str, default=None)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--dumpdir", default=None, type=str, required=True)
    parser.add_argument("--target-feats", type=str, default="feats",
                        choices=["feats", "local"])
    parser.add_argument("--utt2spk", default=None, type=str)
    parser.add_argument("--spk2idx", default=None, type=str)
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
    if args.feats_scp is None:
        if fmt == "hdf5":
            query = "*.h5"
            load_fn = lambda x: read_hdf5(x, args.target_feats)  # noqa: E731
        elif fmt == "npy":
            query = f"*-{args.target_feats}.npy"
            load_fn = np.load
        else:
            raise ValueError("support only hdf5 or npy format.")
        dataset = MelDataset(
            args.rootdir, mel_query=query, mel_load_fn=load_fn,
            return_utt_id=True,
        )
    else:
        dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)

    utt2spk = None
    if args.utt2spk is not None:
        utt2spk = {}
        with open(args.utt2spk) as f:
            for line in f:
                utt, spk = line.split()
                utt2spk[utt] = spk

    os.makedirs(args.dumpdir, exist_ok=True)
    scaler = StreamingScaler()
    spk_scalers: dict[str, StreamingScaler] = {}
    for i in tqdm(range(len(dataset))):
        utt_id, mel = dataset[i]
        scaler.partial_fit(mel)
        if utt2spk is not None:
            spk = utt2spk[utt_id]
            spk_scalers.setdefault(spk, StreamingScaler()).partial_fit(mel)

    if fmt == "hdf5":
        out = os.path.join(args.dumpdir, "stats.h5")
        write_hdf5(out, "mean", scaler.mean_.astype(np.float32))
        write_hdf5(out, "scale", scaler.scale_.astype(np.float32))
        for spk, s in spk_scalers.items():
            write_hdf5(out, f"{spk}/mean", s.mean_.astype(np.float32))
            write_hdf5(out, f"{spk}/scale", s.scale_.astype(np.float32))
    else:
        stats = np.stack(
            [scaler.mean_.astype(np.float32), scaler.scale_.astype(np.float32)]
        )
        np.save(os.path.join(args.dumpdir, "stats.npy"), stats,
                allow_pickle=False)
        for spk, s in spk_scalers.items():
            np.save(
                os.path.join(args.dumpdir, f"stats-{spk}.npy"),
                np.stack([s.mean_.astype(np.float32), s.scale_.astype(np.float32)]),
                allow_pickle=False,
            )
    logging.info("Successfully saved statistics to %s.", args.dumpdir)


if __name__ == "__main__":
    main()
