"""Feature-extraction CLI (`parallel-wavegan-preprocess`).

Behavioral reference: /root/reference/parallel_wavegan/bin/preprocess.py
(logmelfilterbank :26-89, silence trim :360-366, edge pad + truncate to
the frame grid :402-405, different-fs feature extraction :369-387, f0 /
excitation for UHiFiGAN :92-133,:420-442, global_gain_scale + clipping
guard :444-452, HDF5/npy layout :454-528).

Dependency notes: librosa/pyreaper/torchyin are not dependencies here —
silence trimming, resampling and F0 (autocorrelation-based, see
ops/f0.py) are numpy implementations with the same contracts.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.data.datasets import AudioSCPDataset
from parallelwavegan_tpu.ops.mel import logmelfilterbank
from parallelwavegan_tpu.utils.io import find_files, read_wav, write_hdf5


def trim_silence_np(
    audio: np.ndarray,
    top_db: float = 60.0,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> np.ndarray:
    """librosa.effects.trim-equivalent leading/trailing silence removal."""
    if len(audio) < frame_length:
        return audio
    n_frames = 1 + (len(audio) - frame_length) // hop_length
    idx = (
        np.arange(frame_length)[None, :]
        + hop_length * np.arange(n_frames)[:, None]
    )
    rms = np.sqrt(np.mean(audio[idx] ** 2, axis=1))
    ref = np.max(rms)
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(ref, 1e-10))
    keep = np.flatnonzero(db > -top_db)
    if len(keep) == 0:
        return audio[:0]
    start = keep[0] * hop_length
    end = min(len(audio), (keep[-1] + 1) * hop_length + frame_length)
    return audio[start:end]


def resample_poly_np(audio: np.ndarray, fs_in: int, fs_out: int) -> np.ndarray:
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(fs_in, fs_out)
    return resample_poly(audio, fs_out // g, fs_in // g).astype(np.float32)


def _iter_utterances(args):
    if args.rootdir is not None:
        for path in sorted(find_files(args.rootdir, "*.wav")):
            utt_id = os.path.splitext(os.path.basename(path))[0]
            fs, audio = read_wav(path)
            yield utt_id, fs, audio
    else:
        dataset = AudioSCPDataset(
            args.wav_scp,
            segments=args.segments,
            return_utt_id=True,
            return_sampling_rate=True,
        )
        for i in range(len(dataset)):
            utt_id, (audio, fs) = dataset[i]
            yield utt_id, fs, audio


def main():
    """Run the preprocessing pipeline."""
    parser = argparse.ArgumentParser(description="Preprocess audio / extract features.")
    parser.add_argument("--wav-scp", "--scp", default=None, type=str)
    parser.add_argument("--segments", default=None, type=str)
    parser.add_argument("--rootdir", default=None, type=str)
    parser.add_argument("--dumpdir", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--utt2spk", default=None, type=str)
    parser.add_argument("--spk2idx", default=None, type=str)
    parser.add_argument("--skip-mel-ext", default=False, action="store_true")
    parser.add_argument("--extract-f0", default=False, action="store_true")
    parser.add_argument(
        "--allow-different-sampling-rate", default=False, action="store_true"
    )
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.DEBUG if args.verbose > 1 else
        (logging.INFO if args.verbose > 0 else logging.WARN),
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)

    if (args.wav_scp is not None) == (args.rootdir is not None):
        raise ValueError("Please specify either --rootdir or --wav-scp.")

    utt2spkid = None
    if args.utt2spk is not None:
        assert args.spk2idx is not None, "--utt2spk requires --spk2idx"
        spk2idx = {}
        with open(args.spk2idx) as f:
            for line in f:
                spk, idx = line.split()
                spk2idx[spk] = int(idx)
        utt2spkid = {}
        with open(args.utt2spk) as f:
            for line in f:
                utt, spk = line.split()
                utt2spkid[utt] = spk2idx[spk]

    os.makedirs(args.dumpdir, exist_ok=True)
    fmt = config.get("format", "hdf5")
    hop_size = config["hop_size"]

    for utt_id, fs, audio in tqdm(_iter_utterances(args)):
        # sanity checks (preprocess.py:349-357)
        assert audio.ndim == 1, f"{utt_id}: not mono"
        assert np.abs(audio).max() <= 1.0, f"{utt_id}: out of [-1, 1] range"
        if not args.allow_different_sampling_rate:
            assert fs == config["sampling_rate"], (
                f"{utt_id}: fs {fs} != config {config['sampling_rate']}"
            )
        elif fs != config["sampling_rate"]:
            audio = resample_poly_np(audio, fs, config["sampling_rate"])
            fs = config["sampling_rate"]

        if config.get("trim_silence", False):
            audio = trim_silence_np(
                audio,
                top_db=config["trim_threshold_in_db"],
                frame_length=config["trim_frame_size"],
                hop_length=config["trim_hop_size"],
            )

        if "sampling_rate_for_feats" not in config or config[
            "sampling_rate_for_feats"
        ] in (None, fs):
            x = audio
            feat_fs = fs
            feat_hop = hop_size
        else:
            # different-fs feature extraction (preprocess.py:369-387)
            feat_fs = config["sampling_rate_for_feats"]
            x = resample_poly_np(audio, fs, feat_fs)
            assert (
                hop_size * feat_fs % fs == 0
            ), "hop_size must be adjustable to sampling_rate_for_feats"
            feat_hop = hop_size * feat_fs // fs

        mel = logmelfilterbank(
            x,
            sampling_rate=feat_fs,
            hop_size=feat_hop,
            fft_size=config["fft_size"],
            win_length=config["win_length"],
            window=config["window"],
            num_mels=config["num_mels"],
            fmin=config["fmin"],
            fmax=config["fmax"],
            log_base=config.get("log_base", 10.0),
        )

        # pad audio to the frame grid and truncate (preprocess.py:402-405)
        audio = np.pad(audio, (0, config["fft_size"]), mode="reflect")
        audio = audio[: len(mel) * hop_size]
        assert len(mel) * hop_size == len(audio)

        f0 = excitation = local = None
        if args.extract_f0:
            # --extract-f0 produces the VQ-VAE "local" conditioning
            # features: continuous log-F0 + V/UV at the hop grid
            # (reference preprocess.py:407-417; vq1 recipes pass this
            # flag together with --skip-mel-ext)
            from parallelwavegan_tpu.ops.f0 import logf0_and_vuv

            local = logf0_and_vuv(audio, fs, hop_size)
            if local is None:
                logging.warning(f"{utt_id}: all frames unvoiced; skipped.")
                continue
            # audio is already on the mel frame grid (len(mel)*hop above)
            # and the F0 track shares that grid, so wave/local stay in sync
            assert len(local) * hop_size == len(audio), (
                f"{utt_id}: local grid {len(local)} != "
                f"{len(audio) // hop_size} frames"
            )
        if config.get("generator_type") == "UHiFiGANGenerator":
            from parallelwavegan_tpu.ops.f0 import extract_f0_and_excitation

            f0, excitation = extract_f0_and_excitation(
                audio,
                fs,
                hop_size,
                fmin=config.get("f0min", 70.0),
                fmax=config.get("f0max", 340.0),
                sine_amp=config.get("sine_amp", 0.1),
                noise_std=config.get("noise_std", 0.003),
            )
            f0 = f0[: len(mel)]
            # reference layout (preprocess.py:440-442): per-frame rows so
            # the collater can slice with frame indices
            excitation = excitation[: len(mel) * hop_size].reshape(
                len(mel), hop_size
            )

        # apply global gain scale (preprocess.py:444-452)
        gain = config.get("global_gain_scale", 1.0)
        if gain != 1.0:
            audio *= gain
        if np.abs(audio).max() >= 1.0:
            logging.warning(
                f"{utt_id} causes clipping. it is better to re-consider "
                "global gain scale."
            )
            continue

        if fmt == "hdf5":
            path = os.path.join(args.dumpdir, f"{utt_id}.h5")
            write_hdf5(path, "wave", audio.astype(np.float32))
            if not args.skip_mel_ext:
                write_hdf5(path, "feats", mel.astype(np.float32))
            if f0 is not None:
                write_hdf5(path, "f0", f0.astype(np.float32))
                write_hdf5(path, "excitation", excitation.astype(np.float32))
            if local is not None:
                write_hdf5(path, "local", local.astype(np.float32))
            if utt2spkid is not None:
                write_hdf5(path, "global", np.asarray(utt2spkid[utt_id]))
        elif fmt == "npy":
            np.save(
                os.path.join(args.dumpdir, f"{utt_id}-wave.npy"),
                audio.astype(np.float32),
                allow_pickle=False,
            )
            if not args.skip_mel_ext:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-feats.npy"),
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
            if local is not None:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-local.npy"),
                    local.astype(np.float32),
                    allow_pickle=False,
                )
            if utt2spkid is not None:
                np.save(
                    os.path.join(args.dumpdir, f"{utt_id}-global.npy"),
                    np.asarray(utt2spkid[utt_id]),
                    allow_pickle=False,
                )
        else:
            raise ValueError(f"format {fmt} is not supported.")


if __name__ == "__main__":
    main()
