"""Model loading + inference wrapper (the `load_model` public API).

Behavioral reference: /root/reference/parallel_wavegan/utils/utils.py:294-360
(config discovery from the checkpoint dir, generator-only weight load,
stats registered for de-normalization, PQMF attachment for multi-band
models with version-compat defaults, `upsample_kernal_sizes` typo remap
:322-326) plus the per-family ``inference()`` methods in
/root/reference/parallel_wavegan/models/*.py.

TPU design: ``InferenceModel`` jits one forward per padded-length bucket
(mel lengths are rounded up to a bucket multiple and the output trimmed),
so arbitrary-length decoding hits a handful of compiled programs instead
of one per utterance length.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.ops.pqmf import PQMF
from parallelwavegan_tpu.utils.checkpoint import load_generator_params
from parallelwavegan_tpu.utils.config import load_config
from parallelwavegan_tpu.utils.io import read_hdf5


def _load_stats(stats_path: str):
    if stats_path.endswith(".h5"):
        mean = read_hdf5(stats_path, "mean").reshape(-1)
        scale = read_hdf5(stats_path, "scale").reshape(-1)
    else:
        arr = np.load(stats_path)
        mean = arr[0].reshape(-1)
        scale = arr[1].reshape(-1)
    return mean.astype(np.float32), scale.astype(np.float32)


class InferenceModel:
    """A generator + params bundle with a reference-compatible inference()."""

    def __init__(self, generator, params, config, vars_g=None,
                 mean=None, scale=None, pqmf=None, bucket: int = 32):
        self.generator = generator
        # checkpoint leaves arrive as numpy; jnp-ify so traced indexing
        # (embedding/codebook lookups) works under jit
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.vars_g = jax.tree_util.tree_map(jnp.asarray, vars_g or {})
        self.config = config
        self.mean = mean
        self.scale = scale
        self.pqmf = pqmf
        self.bucket = bucket
        self.generator_type = config.get("generator_type", "ParallelWaveGANGenerator")
        self._jit_cache = {}

    # -- family-specific padded forward ---------------------------------
    def _forward_fn(self):
        gen = self.generator
        gtype = self.generator_type
        variables = {"params": self.params, **self.vars_g}
        pqmf = self.pqmf

        if gtype == "ParallelWaveGANGenerator":
            win = self.config["generator_params"].get("aux_context_window", 2)

            def fn(c, z):
                c = jnp.pad(c, ((win, win), (0, 0)), mode="edge")
                y = gen.apply(variables, z[None, :, None], c[None])
                return y[0]

            return fn
        if gtype == "StyleMelGANGenerator":
            nuf = gen.noise_upsample_factor
            uf = gen.upsample_factor

            def fn(c, z):
                # z: (ceil(T/nuf), in_channels) noise; pad mel to z-len * nuf
                noise_len = z.shape[0]
                pad = noise_len * nuf - c.shape[0]
                c = jnp.pad(c, ((0, pad), (0, 0)), mode="edge")
                y = gen.apply(variables, c[None], z[None])
                return y[0]

            return fn

        if gtype in (
            "DiscreteSymbolHiFiGANGenerator",
            "DiscreteSymbolStyleMelGANGenerator",
        ):

            def fn(c, z):
                return gen.apply(variables, c[None].astype("int32"))[0]

            return fn

        def fn(c, z):
            y = gen.apply(variables, c[None])
            if pqmf is not None:
                y = pqmf.synthesis(y)
            return y[0]

        return fn

    def _compiled(self, padded_len: int, noise_len: int | None):
        key = (padded_len, noise_len)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._forward_fn())
        return self._jit_cache[key]

    def inference(self, c, normalize_before: bool = False, rng=None,
                  f0=None, excitation=None, ds=None):
        """mel (T', num_mels) -> waveform (T' * upsample_factor, out).

        Mirrors each reference generator's ``inference`` (noise drawn
        internally, mel context padding, PQMF synthesis, trim to the
        nominal length). ``ds``: optional ground-truth durations for the
        duration generator (reference ``inference(..., ds=ds)``,
        /root/reference/parallel_wavegan/models/hifigan.py discrete
        duration variant) — bypasses the duration predictor.
        """
        if self.generator_type == "UHiFiGANGenerator":
            return self._inference_uhifigan(
                np.asarray(c, np.float32), excitation, normalize_before
            )
        if self.generator_type in (
            "DiscreteSymbolHiFiGANGenerator",
            "DiscreteSymbolStyleMelGANGenerator",
            "DiscreteSymbolDurationGenerator",
        ):
            return self._inference_discrete(np.asarray(c), rng, ds=ds)
        c = np.asarray(c, dtype=np.float32)
        if normalize_before:
            assert self.mean is not None, "stats are not registered"
            c = (c - self.mean) / self.scale
        t = c.shape[0]
        rng = rng if rng is not None else jax.random.key(np.random.randint(2**31))

        if self.generator_type == "StyleMelGANGenerator":
            nuf = self.generator.noise_upsample_factor
            uf = self.generator.upsample_factor
            noise_len = (t - 1) // nuf + 1
            noise_len_p = -(-noise_len // 4) * 4
            z = jax.random.normal(
                rng, (noise_len_p, self.config["generator_params"].get(
                    "in_channels", 128)))
            pad_t = noise_len_p * nuf
            c_p = np.pad(c, ((0, pad_t - t), (0, 0)), mode="edge")
            y = self._compiled(pad_t, noise_len_p)(jnp.asarray(c_p), z)
            return np.asarray(jax.device_get(y))[: t * uf]

        upsample = self._upsample_factor()
        pad_t = -(-t // self.bucket) * self.bucket
        c_p = np.pad(c, ((0, pad_t - t), (0, 0)), mode="edge")
        if self.generator_type == "ParallelWaveGANGenerator":
            z = jax.random.normal(rng, (pad_t * upsample,))
        else:
            z = jnp.zeros((0,))
        y = self._compiled(pad_t, None)(jnp.asarray(c_p), z)
        y = np.asarray(jax.device_get(y))
        return y[: t * upsample]

    # -- batched decode ---------------------------------------------------
    def inference_batch(self, mels: list, normalize_before: bool = False,
                        rng=None, mesh=None):
        """Decode a list of mels as ONE batched forward (per length bucket).

        A serving-throughput capability the reference lacks (its decode
        loops utterance-by-utterance, bin/decode.py:214-234): mels are
        padded to a shared bucket length, stacked, and run as a single
        (B, T, C) forward — one program per bucket length instead of per
        utterance. With ``mesh`` (a 1-D jax.sharding.Mesh), the batch is
        sharded over its devices; B is padded to a device multiple.

        Returns a list of per-utterance waveforms, trimmed to true length.
        """
        if self.generator_type not in self._STREAMABLE:
            raise ValueError(
                f"{self.generator_type} does not support batched decode"
            )
        mels = [np.asarray(c, np.float32) for c in mels]
        if normalize_before:
            assert self.mean is not None, "stats are not registered"
            mels = [(c - self.mean) / self.scale for c in mels]
        lens = [c.shape[0] for c in mels]
        pad_t = -(-max(lens) // self.bucket) * self.bucket
        batch = np.stack([
            np.pad(c, ((0, pad_t - c.shape[0]), (0, 0)), mode="edge")
            for c in mels
        ])
        n_pad_rows = 0
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
            n_pad_rows = (-len(mels)) % n_dev
            if n_pad_rows:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], n_pad_rows, axis=0)]
                )

        up = self._upsample_factor()
        rng = rng if rng is not None else jax.random.key(
            np.random.randint(2**31))
        use_noise = self.generator_type == "ParallelWaveGANGenerator"
        z = (jax.random.normal(rng, (batch.shape[0], pad_t * up))
             if use_noise else jnp.zeros((batch.shape[0], 0)))

        key = ("batch", batch.shape[0], pad_t)
        if key not in self._jit_cache:
            fn = self._forward_fn()
            batched = jax.vmap(fn)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                axis = list(mesh.shape.keys())[0]
                shard = NamedSharding(mesh, P(axis))
                batched = jax.jit(
                    batched, in_shardings=(shard, shard),
                    out_shardings=shard,
                )
            else:
                batched = jax.jit(batched)
            self._jit_cache[key] = batched
        y = np.asarray(jax.device_get(
            self._jit_cache[key](jnp.asarray(batch), z)
        ))
        return [y[i, : lens[i] * up] for i in range(len(mels))]

    # -- streaming (chunked) decode --------------------------------------
    _STREAMABLE = (
        "ParallelWaveGANGenerator",
        "MelGANGenerator",
        "HiFiGANGenerator",
    )

    def inference_streaming(self, c, chunk_frames: int = 256,
                            context_frames: int = 64,
                            normalize_before: bool = False, rng=None):
        """Chunked mel->wave decode for unbounded-length synthesis.

        A new capability over the reference (SURVEY.md §5 "long-context"):
        the mel is processed in fixed-size chunks with ``context_frames``
        of true neighbor context on each side. The two boundary chunks
        (``chunk_frames + context``) run as individual calls; all interior
        chunks (``chunk_frames + 2*context``, identical shapes) are
        stacked and run as ONE vmapped call per power-of-two bucket of at
        most 64 windows — so a 95 s utterance costs 3 dispatches instead
        of ~30, which removes the per-dispatch host/tunnel latency that
        made the round-2 pipelined version ~13x slower than one-shot
        decode. Compiled-program count is O(log n) buckets (max 8) plus
        the two edge shapes; device memory stays O(bucket * chunk).

        When ``context_frames`` covers the generator's receptive field the
        result equals the full-utterance decode: boundary chunks start or
        end at the true utterance edge, so the model's own edge padding
        applies exactly as in the one-shot forward. Only generators whose
        ops are time-local are supported (StyleMelGAN's TADE instance norm
        is global over time; discrete/duration models expand lengths).

        For ParallelWaveGAN the noise track is drawn once for the whole
        utterance and sliced per chunk, so overlapping outputs agree.
        """
        if self.generator_type not in self._STREAMABLE:
            raise ValueError(
                f"{self.generator_type} is not streamable "
                "(global-in-time ops or input-length expansion)"
            )
        c = np.asarray(c, dtype=np.float32)
        if normalize_before:
            assert self.mean is not None, "stats are not registered"
            c = (c - self.mean) / self.scale
        t = c.shape[0]
        chunk, ctx = chunk_frames, context_frames
        up = self._upsample_factor()
        if t <= chunk + ctx:  # too short to stream; reuse bucketed path
            # already-normalized: bypass the normalize_before branch
            return self.inference(c, normalize_before=False, rng=rng)
        rng = rng if rng is not None else jax.random.key(
            np.random.randint(2**31))

        use_noise = self.generator_type == "ParallelWaveGANGenerator"
        z_all = None
        if use_noise:
            z_all = np.asarray(jax.random.normal(rng, (t * up,)))

        fwd = self._compiled_stream(chunk + 2 * ctx)
        fwd_edge = self._compiled_stream(chunk + ctx)
        y = np.empty((t * up,) + self._out_shape_tail(), dtype=np.float32)

        assert ctx <= chunk, "context_frames must not exceed chunk_frames"
        # chunk plan: (lo, hi, fn, valid_lo, valid_hi); first/last use the
        # true utterance boundary so the model's own edge padding applies
        # exactly as in a one-shot forward. Any weak-context interior tail
        # frames are overwritten by the boundary-exact last chunk.
        plan = [(0, chunk + ctx, fwd_edge, 0, chunk)]
        s = chunk
        while s + chunk < t:
            hi = min(s + chunk + ctx, t)
            plan.append((hi - (chunk + 2 * ctx), hi, fwd, s, s + chunk))
            s += chunk
        plan.append((t - (chunk + ctx), t, fwd_edge, t - chunk, t))

        def dispatch(entry):
            lo, hi, fn, _, _ = entry
            z = (jnp.asarray(z_all[lo * up : hi * up])
                 if use_noise else jnp.zeros((0,)))
            return fn(jnp.asarray(c[lo:hi]), z)  # async under jit

        def collect(entry, out_dev):
            lo, _, _, valid_lo, valid_hi = entry
            out = np.asarray(jax.device_get(out_dev))
            off = (valid_lo - lo) * up
            y[valid_lo * up : valid_hi * up] = out[
                off : off + (valid_hi - valid_lo) * up
            ]

        # dispatch order: first edge, then the batched interior slices,
        # then the last edge — all async, collected afterwards. Interior
        # valid ranges are disjoint; the boundary-exact last chunk must be
        # written AFTER the interior (it overwrites weak-context tail
        # frames), which the collect order below preserves.
        first, interior, last = plan[0], plan[1:-1], plan[-1]
        win = chunk + 2 * ctx
        max_batch = 64  # bounds device memory per dispatch
        out_first = dispatch(first)
        interior_out = []  # (slice entries, device array)
        for s0 in range(0, len(interior), max_batch):
            part = interior[s0 : s0 + max_batch]
            n = len(part)
            bucket = 1 << (n - 1).bit_length()
            cw = np.zeros((bucket, win, c.shape[1]), np.float32)
            zw = np.zeros(
                (bucket, win * up if use_noise else 0), np.float32
            )
            for j, (lo, hi, _, _, _) in enumerate(part):
                cw[j] = c[lo:hi]
                if use_noise:
                    zw[j] = z_all[lo * up : hi * up]
            fn_b = self._compiled_stream_batched(win, bucket)
            interior_out.append(
                (part, fn_b(jnp.asarray(cw), jnp.asarray(zw)))
            )
        out_last = dispatch(last)

        collect(first, out_first)
        for part, dev in interior_out:
            outs = np.asarray(jax.device_get(dev))
            for j, entry in enumerate(part):
                lo, _, _, valid_lo, valid_hi = entry
                off = (valid_lo - lo) * up
                y[valid_lo * up : valid_hi * up] = outs[
                    j, off : off + (valid_hi - valid_lo) * up
                ]
        collect(last, out_last)
        return y

    # -- temporal-sharded decode ------------------------------------------
    def inference_sharded(self, c, mesh, context_frames: int = 64,
                          normalize_before: bool = False, rng=None):
        """Decode ONE utterance with its time axis sharded over a mesh.

        A multi-chip capability the reference cannot express (its decode is
        single-GPU per utterance, bin/decode.py:214-234): the mel is cut
        into one window per device — each window carries
        ``context_frames`` of true neighbor context (halo) on each side,
        materialized host-side since mel frames are tiny — and all windows
        run as ONE mesh-sharded XLA program, so a single long utterance
        decodes ~n_devices times faster over ICI.

        Exactness contract matches ``inference_streaming``: the first/last
        windows are pinned to the true utterance edges so the model's own
        edge padding applies exactly as in the one-shot forward; with
        ``context_frames`` covering the receptive field the reassembled
        waveform equals ``inference()`` bit-for-bit. Only time-local
        generators are supported (see ``_STREAMABLE``).
        """
        if self.generator_type not in self._STREAMABLE:
            raise ValueError(
                f"{self.generator_type} is not shardable in time "
                "(global-in-time ops or input-length expansion)"
            )
        c = np.asarray(c, dtype=np.float32)
        if normalize_before:
            assert self.mean is not None, "stats are not registered"
            c = (c - self.mean) / self.scale
        # mirror the one-shot path's bucket padding (edge-replicated mel,
        # output trimmed) so the result equals inference() for ANY length
        t_orig = c.shape[0]
        t = -(-t_orig // self.bucket) * self.bucket
        c = np.pad(c, ((0, t - t_orig), (0, 0)), mode="edge")
        n_dev = int(np.prod(list(mesh.shape.values())))
        ctx = context_frames
        # bucket-align the per-device chunk so utterance lengths share
        # compiled programs (same role as the bucketed one-shot path)
        chunk = -(-t // n_dev)
        chunk = -(-chunk // self.bucket) * self.bucket
        win = chunk + 2 * ctx
        if n_dev == 1 or t < win + chunk:
            # too short to profit from temporal sharding
            return self.inference(
                c[:t_orig], normalize_before=False, rng=rng)
        up = self._upsample_factor()
        rng = rng if rng is not None else jax.random.key(
            np.random.randint(2**31))
        use_noise = self.generator_type == "ParallelWaveGANGenerator"
        z_all = (np.asarray(jax.random.normal(rng, (t * up,)))
                 if use_noise else None)

        # one window per device: (input_lo, valid_lo, valid_hi); interior
        # windows center the valid region; edge windows pin to the true
        # utterance boundary (right-clamped when valid_hi+ctx would
        # overrun, which also gives the last ragged chunk full context)
        windows = []
        for i in range(n_dev):
            vlo = min(i * chunk, t)
            vhi = min(vlo + chunk, t)
            # clamp into [0, t - win]: a clamped window reaches the true
            # utterance edge, so the valid region still sees complete
            # context (exactness preserved even when chunk < ctx)
            lo = max(0, min(vlo - ctx, t - win))
            windows.append((lo, vlo, vhi))

        batch = np.stack([c[lo : lo + win] for lo, _, _ in windows])
        z = (np.stack([z_all[lo * up : (lo + win) * up]
                       for lo, _, _ in windows])
             if use_noise else np.zeros((n_dev, 0), np.float32))

        key = ("sharded", n_dev, win)
        if key not in self._jit_cache:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = list(mesh.shape.keys())[0]
            shard = NamedSharding(mesh, P(axis))
            self._jit_cache[key] = jax.jit(
                jax.vmap(self._forward_fn()),
                in_shardings=(shard, shard), out_shardings=shard,
            )
        y = np.asarray(jax.device_get(
            self._jit_cache[key](jnp.asarray(batch), jnp.asarray(z))
        ))
        out = np.empty((t * up,) + self._out_shape_tail(), dtype=np.float32)
        for i, (lo, vlo, vhi) in enumerate(windows):
            if vhi <= vlo:
                continue
            off = (vlo - lo) * up
            out[vlo * up : vhi * up] = y[i, off : off + (vhi - vlo) * up]
        return out[: t_orig * up]

    def _compiled_stream(self, frames: int):
        key = ("stream", frames)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._forward_fn())
        return self._jit_cache[key]

    def _compiled_stream_batched(self, frames: int, batch: int):
        """One program per (window, bucket): all interior chunks at once."""
        key = ("stream_batch", frames, batch)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(jax.vmap(self._forward_fn()))
        return self._jit_cache[key]

    def _out_shape_tail(self) -> tuple:
        out_ch = self.config["generator_params"].get("out_channels", 1)
        return (1,) if self.pqmf is not None or out_ch == 1 else (out_ch,)

    def _inference_uhifigan(self, c, excitation, normalize_before):
        """UHiFiGAN: (mel (T', C), excitation per-sample) -> wave."""
        import jax

        if normalize_before:
            c = (c - self.mean) / self.scale
        t = c.shape[0]
        factor = 1
        for s in self.config["generator_params"].get("upsample_scales",
                                                     (8, 8, 2, 2)):
            factor *= s
        # bucketed padded length: one compiled program per bucket, not per
        # utterance length (the conv U-Net ignores trailing pad up to edge
        # bleed, trimmed below)
        pad_t = -(-t // self.bucket) * self.bucket
        c = np.pad(np.asarray(c, np.float32),
                   ((0, pad_t - t), (0, 0)), mode="edge")
        excitation = np.asarray(excitation, np.float32).reshape(-1, 1)
        excitation = excitation[: pad_t * factor]
        if len(excitation) < pad_t * factor:
            excitation = np.pad(
                excitation, ((0, pad_t * factor - len(excitation)), (0, 0))
            )
        key = ("uhifigan", pad_t)
        if key not in self._jit_cache:
            gen = self.generator
            variables = {"params": self.params, **self.vars_g}
            self._jit_cache[key] = jax.jit(
                lambda e, cc: gen.apply(variables, e[None], cc[None])[0]
            )
        y = self._jit_cache[key](jnp.asarray(excitation), jnp.asarray(c))
        return np.asarray(jax.device_get(y))[: t * factor]

    def _inference_discrete(self, c, rng, ds=None):
        """Discrete tokens (T, 1|2) -> wave; duration variant predicts ds
        (or uses caller-supplied ground-truth ``ds``)."""
        import jax

        if c.ndim == 1:
            c = c[:, None]
        gtype = self.generator_type
        variables = {"params": self.params, **self.vars_g}
        gen = self.generator
        if gtype == "DiscreteSymbolDurationGenerator":
            from parallelwavegan_tpu.layers.duration import repeat_by_durations_np

            cj = jnp.asarray(c.astype(np.int32))[None]
            key = ("discrete_front", c.shape[0])
            if key not in self._jit_cache:
                # jit the tiny front-end too: eager dispatch through the
                # device tunnel costs more than the compute
                self._jit_cache[key] = jax.jit(
                    lambda cc: (
                        gen.apply(variables, cc, method="predict_durations"),
                        gen.apply(variables, cc, method="embed_tokens"),
                    )
                )
            ds_d, emb_d = self._jit_cache[key](cj)
            if ds is None:
                ds = np.asarray(jax.device_get(ds_d))[0]
            else:
                ds = np.asarray(ds, dtype=np.int32).reshape(-1)
            emb = np.asarray(jax.device_get(emb_d))[0]
            expanded = repeat_by_durations_np(emb, ds)
            t_frames = expanded.shape[0]
            # bucketed trunk: one compiled program per bucket, edge-pad the
            # expanded embedding and trim the synthesized tail
            pad_t = max(self.bucket, -(-t_frames // self.bucket) * self.bucket)
            if pad_t > t_frames:
                expanded = np.pad(
                    expanded, ((0, pad_t - t_frames), (0, 0)), mode="edge"
                )
            key = ("discrete_dur", pad_t)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda e: gen.apply(
                        variables, e[None], method="decode_expanded"
                    )[0]
                )
            y = np.asarray(jax.device_get(
                self._jit_cache[key](jnp.asarray(expanded))
            ))
            factor = len(y) // pad_t
            return y[: t_frames * factor]
        rng = rng if rng is not None else jax.random.key(
            np.random.randint(2**31)
        )
        if gtype == "DiscreteSymbolStyleMelGANGenerator":
            nuf = gen.noise_upsample_factor
            uf = gen.upsample_factor
            t = c.shape[0]
            noise_len = (t - 1) // nuf + 1
            pad_t = noise_len * nuf
            c_p = np.pad(c, ((0, pad_t - t), (0, 0)), mode="edge")
            z = jax.random.normal(
                rng,
                (1, noise_len,
                 self.config["generator_params"].get("in_channels", 128)),
            )
            key = ("discrete_style", pad_t)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda cc, zz: gen.apply(
                        variables, cc[None].astype("int32"), zz
                    )[0]
                )
            y = self._jit_cache[key](jnp.asarray(c_p), z)
            return np.asarray(jax.device_get(y))[: t * uf]
        # plain discrete HiFi-GAN: bucket the token length (pad with edge
        # tokens, trim the tail) so utterances share compiled programs
        t = c.shape[0]
        pad_t = max(self.bucket, -(-t // self.bucket) * self.bucket)
        c_p = np.pad(c, ((0, pad_t - t), (0, 0)), mode="edge")
        fwd = self._compiled(pad_t, None)
        y = np.asarray(jax.device_get(
            fwd(jnp.asarray(c_p.astype(np.float32)), jnp.zeros((0,)))
        ))
        factor = len(y) // pad_t
        return y[: t * factor]

    def _upsample_factor(self) -> int:
        """Mel frame -> output sample ratio, including PQMF synthesis.

        Multi-band generators emit T*prod(scales) frames PER SUBBAND; the
        attached PQMF synthesis multiplies the length by `subbands` again
        (reference layers/pqmf.py:120-149).
        """
        gp = self.config["generator_params"]
        scales = gp.get("upsample_scales")
        if scales is None and "upsample_params" in gp:
            scales = gp["upsample_params"]["upsample_scales"]
        f = 1
        for s in scales or ():
            f *= s
        if self.pqmf is not None:
            f *= gp.get("out_channels", 1)
        return f


def _is_torch_checkpoint(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(4)
    return head[:2] == b"PK" or (head[0] == 0x80 and head[1] <= 5)


def load_model(checkpoint: str, config: dict | None = None,
               stats: str | None = None) -> InferenceModel:
    """Load a trained generator for inference.

    Accepts native (msgpack) checkpoints and reference torch pickles
    (converted on the fly via convert.torch_checkpoint).
    """
    from parallelwavegan_tpu.models import get_model_class

    if config is None:
        dirname = os.path.dirname(checkpoint)
        config = load_config(os.path.join(dirname, "config.yml"))

    generator_type = config.get("generator_type", "ParallelWaveGANGenerator")
    # workaround for the reference's config typo (#295)
    generator_params = {
        k.replace("upsample_kernal_sizes", "upsample_kernel_sizes"): v
        for k, v in config["generator_params"].items()
    }
    generator = get_model_class(generator_type)(**generator_params)

    if _is_torch_checkpoint(checkpoint):
        from parallelwavegan_tpu.convert.torch_checkpoint import (
            convert_generator_state_dict,
        )

        params_g, vars_g = convert_generator_state_dict(
            checkpoint, generator_type, generator_params
        )
    else:
        params_g, vars_g, _ = load_generator_params(checkpoint)

    # stats discovery (utils.py:331-343)
    if stats is None:
        dirname = os.path.dirname(checkpoint)
        ext = "h5" if config.get("format", "hdf5") == "hdf5" else "npy"
        cand = os.path.join(dirname, f"stats.{ext}")
        if os.path.exists(cand):
            stats = cand
    mean = scale = None
    if stats is not None and generator_type != "VQVAE":
        mean, scale = _load_stats(stats)
        logging.info("Successfully registered stats as buffer.")

    pqmf = None
    if config["generator_params"].get("out_channels", 1) > 1:
        pqmf_params = dict(config.get("pqmf_params", {}))
        version = str(config.get("version", "0.1.0"))
        if not pqmf_params and _version_leq(version, "0.4.2"):
            pqmf_params.update(taps=62, cutoff_ratio=0.15, beta=9.0)
        pqmf = PQMF(
            subbands=config["generator_params"]["out_channels"], **pqmf_params
        )

    return InferenceModel(
        generator, params_g, config, vars_g=vars_g,
        mean=mean, scale=scale, pqmf=pqmf,
    )


def _version_leq(a: str, b: str) -> bool:
    def key(v):
        parts = []
        for tok in v.split("."):
            num = "".join(ch for ch in tok if ch.isdigit())
            parts.append(int(num) if num else 0)
        return parts

    return key(a) <= key(b)
