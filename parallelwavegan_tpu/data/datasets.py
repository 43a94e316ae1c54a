"""Numpy dataset classes over dumped features.

Behavioral reference:
/root/reference/parallel_wavegan/datasets/audio_mel_dataset.py
(:18 AudioMelDataset with optional local/global conditioning, :195
AudioMelF0ExcitationDataset, :357 AudioDataset, :500 MelDataset, :643
MelF0ExcitationDataset) and /root/reference/parallel_wavegan/datasets/
scp_dataset.py (:45, :173, :271 — kaldi-style scp datasets with segments
support). Same query/load_fn/threshold/cache surface, torch-free: items
are plain numpy arrays consumed by the Collater.

kaldi binary ark scp (`path.ark:offset`, incl. compressed matrices), HDF5
scp (`path.h5:dataset`), npy scp, and wav scp (+segments) are all native
(utils/kaldi_ark.py replaces the reference's kaldiio dependency).
"""

from __future__ import annotations

import logging
import os

from parallelwavegan_tpu.utils.io import (
    HDF5ScpLoader,
    NpyScpLoader,
    find_files,
    read_hdf5,
    read_wav,
)


def _default_audio_load(x):
    return read_hdf5(x, "wave")


def _default_mel_load(x):
    return read_hdf5(x, "feats")


def _filter_by_length(lengths, threshold, *file_lists):
    idxs = [i for i, l in enumerate(lengths) if l > threshold]
    if len(idxs) != len(lengths):
        logging.warning(
            "Some files are filtered by length threshold (%d -> %d).",
            len(lengths),
            len(idxs),
        )
    return [
        [fl[i] for i in idxs] if fl is not None else None for fl in file_lists
    ]


class _CachedDataset:
    """Base: __len__/__getitem__ with optional in-memory cache."""

    def __init__(self, n: int, allow_cache: bool):
        self.allow_cache = allow_cache
        self.caches: list = [None] * n if allow_cache else []
        self._n = n

    def __len__(self):
        return self._n

    def _cached(self, idx, build):
        if self.allow_cache and self.caches[idx] is not None:
            return self.caches[idx]
        item = build()
        if self.allow_cache:
            self.caches[idx] = item
        return item


class AudioMelDataset(_CachedDataset):
    """Audio + mel (+ optional local/global conditioning) pairs."""

    def __init__(
        self,
        root_dir,
        audio_query="*.h5",
        audio_load_fn=_default_audio_load,
        mel_query="*.h5",
        mel_load_fn=_default_mel_load,
        local_query=None,
        local_load_fn=None,
        global_query=None,
        global_load_fn=None,
        audio_length_threshold=None,
        mel_length_threshold=None,
        return_utt_id=False,
        allow_cache=False,
    ):
        audio_files = sorted(find_files(root_dir, audio_query))
        mel_files = sorted(find_files(root_dir, mel_query))
        local_files = sorted(find_files(root_dir, local_query)) if local_query else None
        global_files = (
            sorted(find_files(root_dir, global_query)) if global_query else None
        )

        if audio_length_threshold is not None:
            lengths = [audio_load_fn(f).shape[0] for f in audio_files]
            audio_files, mel_files, local_files, global_files = _filter_by_length(
                lengths, audio_length_threshold,
                audio_files, mel_files, local_files, global_files,
            )
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            audio_files, mel_files, local_files, global_files = _filter_by_length(
                lengths, mel_length_threshold,
                audio_files, mel_files, local_files, global_files,
            )
        assert len(audio_files) != 0, f"No audio files found in {root_dir}."
        assert len(audio_files) == len(mel_files), (
            f"audio/mel file counts differ ({len(audio_files)} vs {len(mel_files)})."
        )

        self.audio_files = audio_files
        self.mel_files = mel_files
        self.local_files = local_files
        self.global_files = global_files
        self.audio_load_fn = audio_load_fn
        self.mel_load_fn = mel_load_fn
        self.local_load_fn = local_load_fn
        self.global_load_fn = global_load_fn
        self.utt_ids = [
            os.path.splitext(os.path.basename(f))[0] for f in audio_files
        ]
        self.return_utt_id = return_utt_id
        super().__init__(len(audio_files), allow_cache)

    def __getitem__(self, idx):
        def build():
            items = [
                self.audio_load_fn(self.audio_files[idx]),
                self.mel_load_fn(self.mel_files[idx]),
            ]
            if self.local_files is not None:
                items.append(self.local_load_fn(self.local_files[idx]))
            if self.global_files is not None:
                items.append(self.global_load_fn(self.global_files[idx]))
            items = tuple(items)
            if self.return_utt_id:
                return (self.utt_ids[idx],) + items
            return items

        return self._cached(idx, build)


class AudioMelF0ExcitationDataset(_CachedDataset):
    """Audio + mel + f0 + excitation quadruples (UHiFiGAN path)."""

    def __init__(
        self,
        root_dir,
        audio_query="*.h5",
        audio_load_fn=_default_audio_load,
        mel_query="*.h5",
        mel_load_fn=_default_mel_load,
        f0_query="*.h5",
        f0_load_fn=lambda x: read_hdf5(x, "f0"),
        excitation_query="*.h5",
        excitation_load_fn=lambda x: read_hdf5(x, "excitation"),
        audio_length_threshold=None,
        mel_length_threshold=None,
        return_utt_id=False,
        allow_cache=False,
    ):
        audio_files = sorted(find_files(root_dir, audio_query))
        mel_files = sorted(find_files(root_dir, mel_query))
        f0_files = sorted(find_files(root_dir, f0_query))
        excitation_files = sorted(find_files(root_dir, excitation_query))

        if audio_length_threshold is not None:
            lengths = [audio_load_fn(f).shape[0] for f in audio_files]
            audio_files, mel_files, f0_files, excitation_files = _filter_by_length(
                lengths, audio_length_threshold,
                audio_files, mel_files, f0_files, excitation_files,
            )
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            audio_files, mel_files, f0_files, excitation_files = _filter_by_length(
                lengths, mel_length_threshold,
                audio_files, mel_files, f0_files, excitation_files,
            )
        assert len(audio_files) != 0, f"No audio files found in {root_dir}."
        assert len(audio_files) == len(mel_files)

        self.audio_files = audio_files
        self.mel_files = mel_files
        self.f0_files = f0_files
        self.excitation_files = excitation_files
        self.audio_load_fn = audio_load_fn
        self.mel_load_fn = mel_load_fn
        self.f0_load_fn = f0_load_fn
        self.excitation_load_fn = excitation_load_fn
        self.utt_ids = [
            os.path.splitext(os.path.basename(f))[0] for f in audio_files
        ]
        self.return_utt_id = return_utt_id
        super().__init__(len(audio_files), allow_cache)

    def __getitem__(self, idx):
        def build():
            items = (
                self.audio_load_fn(self.audio_files[idx]),
                self.mel_load_fn(self.mel_files[idx]),
                self.f0_load_fn(self.f0_files[idx]),
                self.excitation_load_fn(self.excitation_files[idx]),
            )
            if self.return_utt_id:
                return (self.utt_ids[idx],) + items
            return items

        return self._cached(idx, build)


class AudioDataset(_CachedDataset):
    """Audio-only (+ optional local/global) dataset (VQ-VAE wav2wav path)."""

    def __init__(
        self,
        root_dir,
        audio_query="*.h5",
        audio_load_fn=_default_audio_load,
        local_query=None,
        local_load_fn=None,
        global_query=None,
        global_load_fn=None,
        audio_length_threshold=None,
        return_utt_id=False,
        allow_cache=False,
    ):
        audio_files = sorted(find_files(root_dir, audio_query))
        local_files = (
            sorted(find_files(root_dir, local_query)) if local_query else None
        )
        global_files = (
            sorted(find_files(root_dir, global_query)) if global_query else None
        )
        if audio_length_threshold is not None:
            lengths = [audio_load_fn(f).shape[0] for f in audio_files]
            audio_files, local_files, global_files = _filter_by_length(
                lengths, audio_length_threshold,
                audio_files, local_files, global_files,
            )
        assert len(audio_files) != 0, f"No audio files found in {root_dir}."

        self.audio_files = audio_files
        self.local_files = local_files
        self.global_files = global_files
        self.audio_load_fn = audio_load_fn
        self.local_load_fn = local_load_fn
        self.global_load_fn = global_load_fn
        self.utt_ids = [
            os.path.splitext(os.path.basename(f))[0] for f in audio_files
        ]
        self.return_utt_id = return_utt_id
        super().__init__(len(audio_files), allow_cache)

    def __getitem__(self, idx):
        def build():
            items = (self.audio_load_fn(self.audio_files[idx]),)
            if self.local_files is not None:
                items += (self.local_load_fn(self.local_files[idx]),)
            if self.global_files is not None:
                items += (self.global_load_fn(self.global_files[idx]),)
            if len(items) == 1:
                items = items[0]
            if self.return_utt_id:
                if not isinstance(items, tuple):
                    items = (items,)
                return (self.utt_ids[idx],) + items
            return items

        return self._cached(idx, build)


class MelDataset(_CachedDataset):
    """Mel-only (+ optional local/global) dataset (decode path)."""

    def __init__(
        self,
        root_dir,
        mel_query="*.h5",
        mel_load_fn=_default_mel_load,
        local_query=None,
        local_load_fn=None,
        global_query=None,
        global_load_fn=None,
        mel_length_threshold=None,
        return_utt_id=False,
        allow_cache=False,
    ):
        mel_files = sorted(find_files(root_dir, mel_query))
        local_files = sorted(find_files(root_dir, local_query)) if local_query else None
        global_files = (
            sorted(find_files(root_dir, global_query)) if global_query else None
        )
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            mel_files, local_files, global_files = _filter_by_length(
                lengths, mel_length_threshold, mel_files, local_files, global_files
            )
        assert len(mel_files) != 0, f"No mel files found in {root_dir}."

        self.mel_files = mel_files
        self.local_files = local_files
        self.global_files = global_files
        self.mel_load_fn = mel_load_fn
        self.local_load_fn = local_load_fn
        self.global_load_fn = global_load_fn
        self.utt_ids = [os.path.splitext(os.path.basename(f))[0] for f in mel_files]
        self.return_utt_id = return_utt_id
        super().__init__(len(mel_files), allow_cache)

    def __getitem__(self, idx):
        def build():
            items = [self.mel_load_fn(self.mel_files[idx])]
            if self.local_files is not None:
                items.append(self.local_load_fn(self.local_files[idx]))
            if self.global_files is not None:
                items.append(self.global_load_fn(self.global_files[idx]))
            items = tuple(items) if len(items) > 1 else items[0]
            if self.return_utt_id:
                if not isinstance(items, tuple):
                    items = (items,)
                return (self.utt_ids[idx],) + items
            return items

        return self._cached(idx, build)


class MelF0ExcitationDataset(_CachedDataset):
    """Mel + f0 + excitation dataset (UHiFiGAN decode path)."""

    def __init__(
        self,
        root_dir,
        mel_query="*.h5",
        mel_load_fn=_default_mel_load,
        f0_query="*.h5",
        f0_load_fn=lambda x: read_hdf5(x, "f0"),
        excitation_query="*.h5",
        excitation_load_fn=lambda x: read_hdf5(x, "excitation"),
        mel_length_threshold=None,
        return_utt_id=False,
        allow_cache=False,
    ):
        mel_files = sorted(find_files(root_dir, mel_query))
        f0_files = sorted(find_files(root_dir, f0_query))
        excitation_files = sorted(find_files(root_dir, excitation_query))
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            mel_files, f0_files, excitation_files = _filter_by_length(
                lengths, mel_length_threshold, mel_files, f0_files, excitation_files
            )
        assert len(mel_files) != 0, f"No mel files found in {root_dir}."

        self.mel_files = mel_files
        self.f0_files = f0_files
        self.excitation_files = excitation_files
        self.mel_load_fn = mel_load_fn
        self.f0_load_fn = f0_load_fn
        self.excitation_load_fn = excitation_load_fn
        self.utt_ids = [os.path.splitext(os.path.basename(f))[0] for f in mel_files]
        self.return_utt_id = return_utt_id
        super().__init__(len(mel_files), allow_cache)

    def __getitem__(self, idx):
        def build():
            items = (
                self.mel_load_fn(self.mel_files[idx]),
                self.f0_load_fn(self.f0_files[idx]),
                self.excitation_load_fn(self.excitation_files[idx]),
            )
            if self.return_utt_id:
                return (self.utt_ids[idx],) + items
            return items

        return self._cached(idx, build)


# ---------------------------------------------------------------------------
# kaldi-style scp datasets
# ---------------------------------------------------------------------------


def _get_feats_scp_loader(feats_scp):
    """Sniff the scp value format (scp_dataset.py:18-42 semantics)."""
    with open(feats_scp) as f:
        value = f.readlines()[0].replace("\n", "").split()[1]
    if ":" in value:
        value_ = value.split(":")[0]
        if value_.endswith(".ark"):
            from parallelwavegan_tpu.utils.kaldi_ark import ArkScpLoader

            return ArkScpLoader(feats_scp)
        if value_.endswith(".h5"):
            return HDF5ScpLoader(feats_scp)
        raise ValueError(f"Not supported feats.scp type ({value}).")
    if value.endswith(".h5"):
        return HDF5ScpLoader(feats_scp)
    if value.endswith(".npy"):
        return NpyScpLoader(feats_scp)
    raise ValueError(f"Not supported feats.scp type ({value}).")


class _WavScpLoader:
    """wav.scp (+ optional kaldi segments) -> float waveform loader."""

    def __init__(self, wav_scp, segments=None):
        self.data = {}
        with open(wav_scp) as f:
            for line in f:
                if not line.strip():
                    continue
                key, value = line.strip().split(maxsplit=1)
                if value.endswith("|") or value.startswith("|"):
                    raise ValueError("piped wav.scp entries are not supported")
                self.data[key] = value
        self.segments = None
        if segments is not None:
            self.segments = {}
            with open(segments) as f:
                for line in f:
                    if not line.strip():
                        continue
                    utt, rec, start, end = line.strip().split()
                    self.segments[utt] = (rec, float(start), float(end))

    def keys(self):
        return (self.segments or self.data).keys()

    def __len__(self):
        return len(self.segments or self.data)

    def __getitem__(self, key):
        if self.segments is not None:
            rec, start, end = self.segments[key]
            fs, wav = read_wav(self.data[rec])
            s = int(start * fs)
            e = len(wav) if end < 0 else int(end * fs)
            return fs, wav[s:e]
        return read_wav(self.data[key])


class AudioMelSCPDataset(_CachedDataset):
    """wav.scp + feats.scp dataset with kaldi segments support."""

    def __init__(
        self,
        wav_scp,
        feats_scp,
        segments=None,
        audio_length_threshold=None,
        mel_length_threshold=None,
        return_utt_id=False,
        return_sampling_rate=False,
        allow_cache=False,
    ):
        self.audio_loader = _WavScpLoader(wav_scp, segments)
        self.mel_loader = _get_feats_scp_loader(feats_scp)
        utt_ids = [k for k in self.audio_loader.keys() if k in self.mel_loader.keys()]

        if audio_length_threshold is not None:
            lengths = [self.audio_loader[k][1].shape[0] for k in utt_ids]
            (utt_ids,) = _filter_by_length(lengths, audio_length_threshold, utt_ids)
        if mel_length_threshold is not None:
            lengths = [self.mel_loader[k].shape[0] for k in utt_ids]
            (utt_ids,) = _filter_by_length(lengths, mel_length_threshold, utt_ids)
        assert len(utt_ids) != 0, f"No utterances found in {wav_scp}."

        self.utt_ids = utt_ids
        self.return_utt_id = return_utt_id
        self.return_sampling_rate = return_sampling_rate
        super().__init__(len(utt_ids), allow_cache)

    def __getitem__(self, idx):
        def build():
            utt_id = self.utt_ids[idx]
            fs, audio = self.audio_loader[utt_id]
            mel = self.mel_loader[utt_id]
            if self.return_sampling_rate:
                audio = (audio, fs)
            if self.return_utt_id:
                return utt_id, audio, mel
            return audio, mel

        return self._cached(idx, build)


class AudioSCPDataset(_CachedDataset):
    """wav.scp-only dataset with kaldi segments support."""

    def __init__(
        self,
        wav_scp,
        segments=None,
        audio_length_threshold=None,
        return_utt_id=False,
        return_sampling_rate=False,
        allow_cache=False,
    ):
        self.audio_loader = _WavScpLoader(wav_scp, segments)
        utt_ids = list(self.audio_loader.keys())
        if audio_length_threshold is not None:
            lengths = [self.audio_loader[k][1].shape[0] for k in utt_ids]
            (utt_ids,) = _filter_by_length(lengths, audio_length_threshold, utt_ids)
        assert len(utt_ids) != 0, f"No utterances found in {wav_scp}."
        self.utt_ids = utt_ids
        self.return_utt_id = return_utt_id
        self.return_sampling_rate = return_sampling_rate
        super().__init__(len(utt_ids), allow_cache)

    def __getitem__(self, idx):
        def build():
            utt_id = self.utt_ids[idx]
            fs, audio = self.audio_loader[utt_id]
            if self.return_sampling_rate:
                audio = (audio, fs)
            if self.return_utt_id:
                return utt_id, audio
            return audio

        return self._cached(idx, build)


class MelSCPDataset(_CachedDataset):
    """feats.scp-only dataset (decode path)."""

    def __init__(
        self,
        feats_scp,
        mel_length_threshold=None,
        return_utt_id=False,
        allow_cache=False,
    ):
        self.mel_loader = _get_feats_scp_loader(feats_scp)
        utt_ids = list(self.mel_loader.keys())
        if mel_length_threshold is not None:
            lengths = [self.mel_loader[k].shape[0] for k in utt_ids]
            (utt_ids,) = _filter_by_length(lengths, mel_length_threshold, utt_ids)
        assert len(utt_ids) != 0, f"No utterances found in {feats_scp}."
        self.utt_ids = utt_ids
        self.return_utt_id = return_utt_id
        super().__init__(len(utt_ids), allow_cache)

    def __getitem__(self, idx):
        def build():
            utt_id = self.utt_ids[idx]
            mel = self.mel_loader[utt_id]
            if self.return_utt_id:
                return utt_id, mel
            return mel

        return self._cached(idx, build)
