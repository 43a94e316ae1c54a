#!/usr/bin/env python3
"""Generic singing-corpus data prep shared by the singing recipes.

Role equivalent of the reference's per-recipe ``local/dataset_split.py``
(e.g. /root/reference/egs/kiritan/voc1/local/dataset_split.py): find
(wav, alignment-label) pairs, bucket whole songs into train/dev/eval by
song id, and write ``wav.scp`` / ``utt2spk`` / ``label`` per split. The
``label`` file is then consumed by ``prep_singing_segments.py``.

Usage from a recipe's local/data_prep.py:

    from singing_data_prep import prepare
    prepare(db_root, data_dir, prefix="kiritan", spk="kiritan",
            wav_glob="wav/*.wav", label_for=lambda w: ...,
            dev_songs=[...], eval_songs=[...])

Label files are HTS-style mono labels: one ``<start> <end> <phone>`` per
line; start/end either in seconds or in 100 ns HTS units (auto-detected).
"""

import glob
import os


def read_mono_label(path):
    """Read an HTS-style mono label -> [(start_sec, end_sec, phone)]."""
    entries = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            start, end, phone = float(parts[0]), float(parts[1]), parts[2]
            entries.append([start, end, phone])
    if not entries:
        return entries
    # HTS uses 100 ns units; song ends are way beyond any plausible seconds
    if entries[-1][1] > 1e5:
        for e in entries:
            e[0] *= 1e-7
            e[1] *= 1e-7
    return [(s, e, p) for s, e, p in entries]


def prepare(db_root, data_dir, prefix, spk, wav_glob, label_for,
            dev_songs, eval_songs, song_id=None, train_name="train_nodev",
            dev_name="dev", eval_name="eval", resample_to=None):
    """Write wav.scp/utt2spk/label for the three splits.

    Args:
        wav_glob: glob (relative to db_root) finding all song wavs.
        label_for: callable(wav_path) -> label path (or None to skip).
        dev_songs/eval_songs: song-id membership for dev/eval splits.
        song_id: callable(wav_path) -> song id; default = file stem.
    """
    wavs = sorted(glob.glob(os.path.join(db_root, wav_glob)))
    assert wavs, f"no wavs matching {wav_glob} under {db_root}"
    song_id = song_id or (lambda w: os.path.splitext(os.path.basename(w))[0])

    splits = {train_name: [], dev_name: [], eval_name: []}
    for wav in wavs:
        sid = song_id(wav)
        lab = label_for(wav)
        if lab is None or not os.path.exists(lab):
            print(f"no label for {wav}; skipped")
            continue
        if resample_to is not None:
            dump = os.path.join(data_dir, f"wav{resample_to}")
            os.makedirs(dump, exist_ok=True)
            dst = os.path.join(dump, f"{prefix}_{sid}.wav")
            if not os.path.exists(dst):
                resample_wav(wav, dst, resample_to)
            wav = dst
        if sid in dev_songs:
            name = dev_name
        elif sid in eval_songs:
            name = eval_name
        else:
            name = train_name
        splits[name].append((f"{prefix}_{sid}", os.path.abspath(wav), lab))

    for name, items in splits.items():
        d = os.path.join(data_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "wav.scp"), "w") as f:
            for rec, wav, _ in items:
                f.write(f"{rec} {wav}\n")
        with open(os.path.join(d, "utt2spk"), "w") as f:
            for rec, _, _ in items:
                f.write(f"{rec} {spk}\n")
        with open(os.path.join(d, "label"), "w") as f:
            for rec, _, lab in items:
                entries = read_mono_label(lab)
                flat = " ".join(f"{s:.4f} {e:.4f} {p}" for s, e, p in entries)
                f.write(f"{rec} {flat}\n")
    print("prepared:", {k: len(v) for k, v in splits.items()})


def resample_wav(src, dst, target_fs):
    """Convert a wav to mono 16-bit at target_fs (scipy polyphase).

    Replaces the reference recipes' ``sox ... -c 1 -b 16 -r FS`` dump step
    (e.g. /root/reference/egs/kising/voc1/local/data_prep.py sox call).
    """
    import math

    import numpy as np
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    fs, data = wavfile.read(src)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if data.dtype == np.int16:
        data = data.astype(np.float64) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float64) / 2147483648.0
    else:
        data = data.astype(np.float64)
    if fs != target_fs:
        g = math.gcd(int(fs), int(target_fs))
        data = resample_poly(data, target_fs // g, fs // g)
    data = np.clip(data * 32767.0, -32768, 32767).astype(np.int16)
    wavfile.write(dst, target_fs, data)
