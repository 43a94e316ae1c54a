"""Random fixed-length crop collater producing static-shape NTC batches.

Behavioral reference: /root/reference/parallel_wavegan/bin/train.py:646-925
(random frame start per utterance; audio slice [start*hop, start*hop + L];
mel slice [start - win, start + frames + win] with aux_context_window
margin; optional noise input z ~ N(0,1); f0/excitation slices; duration
computation via unique_consecutive for discrete symbols; VQ local/global
branch).

TPU design: output shapes are fully static per config, so one jitted train
step serves every batch. Layout is NTC: y (B, T, 1), c (B, T'+2w, C),
z (B, T, 1). Randomness comes from an explicit ``numpy.random.Generator``
so per-host loaders can be seeded deterministically.
"""

from __future__ import annotations

import numpy as np


class Collater:
    """Build fixed-shape batches from variable-length (audio, mel, ...) items."""

    def __init__(
        self,
        batch_max_steps=20480,
        hop_size=256,
        aux_context_window=2,
        use_noise_input=False,
        use_f0_and_excitation=False,
        use_aux_input=True,
        use_duration=False,
        use_global_condition=False,
        use_local_condition=False,
        pad_value=0,
        rng: np.random.Generator | None = None,
    ):
        if hop_size is not None:
            if batch_max_steps % hop_size != 0:
                batch_max_steps += -(batch_max_steps % hop_size)
            assert batch_max_steps % hop_size == 0
            self.hop_size = hop_size
            self.batch_max_frames = batch_max_steps // hop_size
        self.batch_max_steps = batch_max_steps
        self.aux_context_window = aux_context_window
        self.use_noise_input = use_noise_input
        self.use_f0_and_excitation = use_f0_and_excitation
        self.use_aux_input = use_aux_input
        self.use_duration = use_duration
        self.use_global_condition = use_global_condition
        self.use_local_condition = use_local_condition
        self.pad_value = pad_value
        self.rng = rng or np.random.default_rng()

        if self.use_aux_input or self.use_local_condition:
            self.start_offset = aux_context_window
            self.end_offset = -(self.batch_max_frames + aux_context_window)
            self.mel_threshold = self.batch_max_frames + 2 * aux_context_window
        else:
            self.start_offset = 0
            self.end_offset = -self.batch_max_steps
            self.audio_threshold = self.batch_max_steps

    def __call__(self, batch, rng=None) -> dict:
        """Collate items into a dict of float32/int32 numpy arrays.

        Returns keys among: 'y' (B, T, 1), 'c' (B, T'+2w, C), 'z' (B, T, 1),
        'f0' (B, T', 1), 'excitation' (B, T', C'), 'ds' (B, T'), 'local',
        'global'.

        ``rng`` overrides the instance generator for this call — the loader
        passes a per-batch child generator so concurrent batch assembly is
        thread-safe and seed-deterministic.
        """
        rng = rng if rng is not None else self.rng
        if self.use_aux_input:
            return self._collate_mel2wav(batch, rng)
        return self._collate_vq(batch, rng)

    # ------------------------------------------------------------------
    def _collate_mel2wav(self, batch, rng) -> dict:
        batch = [
            self._adjust_length(*b) for b in batch if len(b[1]) > self.mel_threshold
        ]
        if not batch:
            raise ValueError(
                "every utterance in the batch is shorter than "
                f"mel_threshold={self.mel_threshold} frames"
            )
        xs = [b[0] for b in batch]
        cs = [b[1] for b in batch]

        c_lengths = [len(c) for c in cs]
        start_frames = np.array(
            [
                rng.integers(self.start_offset, cl + self.end_offset)
                for cl in c_lengths
            ]
        )
        x_starts = start_frames * self.hop_size
        c_starts = start_frames - self.aux_context_window
        c_ends = start_frames + self.batch_max_frames + self.aux_context_window

        y_batch = np.stack(
            [x[s : s + self.batch_max_steps] for x, s in zip(xs, x_starts)]
        ).astype(np.float32)[..., None]
        c_batch = np.stack(
            [c[s:e] for c, s, e in zip(cs, c_starts, c_ends)]
        )

        if self.use_duration:
            # collapse consecutive identical symbols into (code, duration)
            codes, ds = [], []
            for c in c_batch:
                code, d = _unique_consecutive(c)
                codes.append(code)
                ds.append(d)
            max_len = max(len(d) for d in ds)
            c_pad = np.full(
                (len(codes), max_len) + codes[0].shape[1:],
                self.pad_value,
                dtype=np.int32,
            )
            d_pad = np.zeros((len(ds), max_len), dtype=np.int32)
            for i, (code, d) in enumerate(zip(codes, ds)):
                c_pad[i, : len(code)] = code
                d_pad[i, : len(d)] = d
            return {"c": c_pad, "y": y_batch, "ds": d_pad}

        out = {"c": c_batch.astype(np.float32), "y": y_batch}
        if self.use_noise_input:
            out["z"] = rng.standard_normal(y_batch.shape).astype(np.float32)
        if self.use_f0_and_excitation:
            fs = [b[2] for b in batch]
            es = [b[3] for b in batch]
            f_batch = np.stack([f[s:e] for f, s, e in zip(fs, c_starts, c_ends)])
            e_batch = np.stack([e[s:e_] for e, s, e_ in zip(es, c_starts, c_ends)])
            if f_batch.ndim == 2:
                f_batch = f_batch[..., None]
            out["f0"] = f_batch.astype(np.float32)
            out["excitation"] = e_batch.reshape(
                e_batch.shape[0], -1, 1
            ).astype(np.float32)
        return out

    # ------------------------------------------------------------------
    def _collate_vq(self, batch, rng) -> dict:
        if self.use_local_condition:
            # strict >: a boundary-length item leaves rng.integers with an
            # empty range (same contract as the mel2wav filter above)
            items = [b for b in batch if len(b[1]) > self.mel_threshold]
            if not items:
                raise ValueError(
                    "no utterance in the batch is longer than "
                    f"mel_threshold={self.mel_threshold} frames"
                )
            items = [
                self._adjust_length(b[0], b[1]) + tuple(b[2:]) for b in items
            ]
            l_lengths = [len(b[1]) for b in items]
            l_starts = np.array(
                [
                    rng.integers(self.start_offset, ll + self.end_offset)
                    for ll in l_lengths
                ]
            )
            y_starts = l_starts * self.hop_size
            y_batch = np.stack(
                [b[0][s : s + self.batch_max_steps] for b, s in zip(items, y_starts)]
            ).astype(np.float32)[..., None]
            l_batch = np.stack(
                [
                    b[1][s : s + self.batch_max_frames]
                    for b, s in zip(items, l_starts)
                ]
            ).astype(np.float32)
            out = {"y": y_batch, "local": l_batch}
            if self.use_global_condition:
                out["global"] = np.array(
                    [np.reshape(b[2], (1,))[0] for b in items], dtype=np.int32
                )
            return out

        if self.use_global_condition:
            items = [b for b in batch if len(b[0]) > self.audio_threshold]
        else:
            items = [(b,) for b in batch if len(b) > self.audio_threshold]
        if not items:
            raise ValueError(
                "no utterance in the batch is longer than "
                f"audio_threshold={self.audio_threshold} samples"
            )
        y_lengths = [len(b[0]) for b in items]
        y_starts = np.array(
            [
                rng.integers(self.start_offset, yl + self.end_offset)
                for yl in y_lengths
            ]
        )
        y_batch = np.stack(
            [b[0][s : s + self.batch_max_steps] for b, s in zip(items, y_starts)]
        ).astype(np.float32)[..., None]
        out = {"y": y_batch}
        if self.use_global_condition:
            out["global"] = np.array(
                [np.reshape(b[1], (1,))[0] for b in items], dtype=np.int32
            )
        return out

    # ------------------------------------------------------------------
    def _adjust_length(self, x, c, *extras):
        """Edge-pad audio so len(x) == len(c) * hop (train.py:877-897)."""
        if len(x) < len(c) * self.hop_size:
            x = np.pad(x, (0, len(c) * self.hop_size - len(x)), mode="edge")
        assert len(x) == len(c) * self.hop_size
        return (x, c) + extras


def _unique_consecutive(c: np.ndarray):
    """Collapse runs of identical rows -> (codes, counts) (torch.unique_consecutive)."""
    c = np.asarray(c)
    if c.ndim == 1:
        c = c[:, None]
    change = np.any(c[1:] != c[:-1], axis=tuple(range(1, c.ndim)))
    boundaries = np.flatnonzero(np.concatenate([[True], change]))
    counts = np.diff(np.concatenate([boundaries, [len(c)]]))
    return c[boundaries].astype(np.int32), counts.astype(np.int32)
