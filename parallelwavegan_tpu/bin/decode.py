"""Decoding CLI (`parallel-wavegan-decode`).

Behavioral reference: /root/reference/parallel_wavegan/bin/decode.py
(config discovery from the checkpoint dir :124-129, load_model +
remove_weight_norm + eval :140-149, per-utterance inference with RTF
accounting :214-235, 16-bit PCM output :238-243, --normalize-before using
registered stats :144-146).

TPU design: inference runs through InferenceModel's bucketed jitted
forward, so the whole dev set hits a handful of compiled programs; RTF is
measured with block_until_ready semantics (device_get inside inference).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
import yaml
from tqdm import tqdm

from parallelwavegan_tpu.data.datasets import (
    MelDataset,
    MelF0ExcitationDataset,
    MelSCPDataset,
)
from parallelwavegan_tpu.utils.io import read_hdf5, write_wav
from parallelwavegan_tpu.utils.model import load_model


def main():
    parser = argparse.ArgumentParser(description="Decode with a trained vocoder.")
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--segments", default=None, type=str,
                        help="kaldi-style segments file (VQ wav.scp decode)")
    parser.add_argument("--dumpdir", default=None, type=str)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--normalize-before", default=False, action="store_true")
    parser.add_argument("--use-f0-and-excitation", default=None,
                        action="store_true",
                        help="defaults on when the checkpoint config's "
                             "generator is UHiFiGANGenerator (reference "
                             "decode.py:156 auto-detection)")
    parser.add_argument(
        "--use-pallas-stack", default=False, action="store_true",
        help="fused whole-cycle Pallas inference kernel (PWG only; same "
             "params, ~2.2x faster than the XLA path on TPU)",
    )
    parser.add_argument(
        "--use-pallas-tail", default=False, action="store_true",
        help="fused decode-tail Pallas kernel (HiFi-GAN family; same "
             "params, ~1.55x faster than the XLA path on TPU)",
    )
    parser.add_argument(
        "--use-pallas-stacks", default=False, action="store_true",
        help="fused residual-stack Pallas kernel (MelGAN / multi-band "
             "MelGAN; same params, ~1.5x faster than the XLA path on TPU)",
    )
    parser.add_argument("--batch-size", type=int, default=1,
                        help="decode N utterances per forward (length-"
                             "bucketed); >1 is a serving-throughput mode "
                             "the reference lacks")
    parser.add_argument("--streaming", default=False, action="store_true",
                        help="chunked decode: fixed-shape jit programs and "
                             "O(chunk) device memory for unbounded lengths "
                             "(HiFiGAN/MelGAN/PWG families)")
    parser.add_argument("--sharded", default=False, action="store_true",
                        help="shard decode over all visible devices: each "
                             "utterance's time axis is split across the "
                             "mesh (bit-equal to one-shot decode); with "
                             "--batch-size >1 the batch is mesh-sharded "
                             "instead")
    parser.add_argument("--chunk-frames", type=int, default=256)
    parser.add_argument("--context-frames", type=int, default=64)
    parser.add_argument("--compilation-cache", default=None,
                        help="persistent XLA compile-cache dir (default "
                             "~/.cache/parallelwavegan_tpu/xla; restarts "
                             "skip the 20-40 s first compile)")
    parser.add_argument("--no-compilation-cache", action="store_true")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    if not args.no_compilation_cache:
        from parallelwavegan_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)

    config = None
    if args.config is not None:
        with open(args.config) as f:
            config = yaml.load(f, Loader=yaml.SafeLoader)
    else:
        dirname = os.path.dirname(args.checkpoint)
        with open(os.path.join(dirname, "config.yml")) as f:
            config = yaml.load(f, Loader=yaml.SafeLoader)

    if (args.feats_scp is not None) == (args.dumpdir is not None):
        raise ValueError("Please specify either --dumpdir or --feats-scp.")

    if config.get("generator_type") == "VQVAE":
        from parallelwavegan_tpu.utils.config import validate_local_condition

        validate_local_condition(config)
        return _decode_vqvae(args, config)

    if args.use_f0_and_excitation is None:
        args.use_f0_and_excitation = (
            config.get("generator_type") == "UHiFiGANGenerator"
        )

    fmt = config.get("format", "hdf5")
    if args.dumpdir is not None:
        if fmt == "hdf5":
            mel_query = "*.h5"
            mel_load_fn = lambda x: read_hdf5(x, "feats")  # noqa: E731
        elif fmt == "npy":
            mel_query = "*-feats.npy"
            mel_load_fn = np.load
        else:
            raise ValueError("Support only hdf5 or npy format.")
        if args.use_f0_and_excitation:
            extra = {} if fmt == "hdf5" else dict(
                f0_query="*-f0.npy", f0_load_fn=np.load,
                excitation_query="*-excitation.npy",
                excitation_load_fn=np.load,
            )
            dataset = MelF0ExcitationDataset(
                args.dumpdir, mel_query=mel_query, mel_load_fn=mel_load_fn,
                return_utt_id=True, **extra,
            )
        else:
            dataset = MelDataset(
                args.dumpdir, mel_query=mel_query, mel_load_fn=mel_load_fn,
                return_utt_id=True,
            )
    else:
        if args.use_f0_and_excitation:
            raise NotImplementedError(
                "scp decode does not carry f0/excitation features "
                "(UHiFiGAN needs --dumpdir; same restriction as normalize)"
            )
        dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)
    logging.info("The number of features to be decoded = %d.", len(dataset))

    if args.use_pallas_stack and config.get("generator_type",
                                            "ParallelWaveGANGenerator") == (
            "ParallelWaveGANGenerator"):
        config = dict(config)
        config["generator_params"] = dict(config["generator_params"])
        config["generator_params"]["use_pallas_stack"] = True
    if args.use_pallas_tail and config.get("generator_type", "") in (
            "HiFiGANGenerator", "DiscreteSymbolHiFiGANGenerator",
            "DiscreteSymbolDurationGenerator"):
        config = dict(config)
        config["generator_params"] = dict(config["generator_params"])
        config["generator_params"]["use_pallas_tail"] = True
    if args.use_pallas_stacks and config.get("generator_type", "") == (
            "MelGANGenerator"):
        config = dict(config)
        config["generator_params"] = dict(config["generator_params"])
        config["generator_params"]["use_pallas_stacks"] = True
    model = load_model(args.checkpoint, config)
    logging.info("Loaded model parameters from %s.", args.checkpoint)

    os.makedirs(args.outdir, exist_ok=True)
    fs = config["sampling_rate"]

    mesh = None
    if args.sharded:
        from parallelwavegan_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        logging.info("Sharded decode over %d devices.",
                     int(np.prod(list(mesh.shape.values()))))

    if args.batch_size > 1 and not args.use_f0_and_excitation:
        return _decode_batched(args, model, dataset, fs, mesh=mesh)

    total_rtf = 0.0
    pbar = tqdm(range(len(dataset)))
    for i in pbar:
        item = dataset[i]
        utt_id, c = item[0], item[1]
        start = time.time()
        if args.use_f0_and_excitation:
            f0, excitation = item[2], item[3]
            y = model.inference(
                c, normalize_before=args.normalize_before,
                f0=f0, excitation=excitation,
            )
        elif args.streaming:
            y = model.inference_streaming(
                c, chunk_frames=args.chunk_frames,
                context_frames=args.context_frames,
                normalize_before=args.normalize_before,
            )
        elif mesh is not None:
            y = model.inference_sharded(
                c, mesh, context_frames=args.context_frames,
                normalize_before=args.normalize_before,
            )
        else:
            y = model.inference(c, normalize_before=args.normalize_before)
        y = np.asarray(y)[:, 0]
        rtf = (time.time() - start) / (len(y) / fs)
        pbar.set_postfix({"RTF": rtf})
        total_rtf += rtf
        write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"), fs, y)

    logging.info(
        "Finished generation of %d utterances (RTF = %.06f).",
        len(dataset), total_rtf / max(len(dataset), 1),
    )


def _decode_batched(args, model, dataset, fs, mesh=None):
    """Length-bucketed batched decode: N utterances per jitted forward."""
    items = [(item[0], np.asarray(item[1])) for item in
             (dataset[i] for i in range(len(dataset)))]
    items.sort(key=lambda kv: kv[1].shape[0])  # bucket similar lengths
    total_time, total_audio = 0.0, 0.0
    pbar = tqdm(range(0, len(items), args.batch_size))
    for s in pbar:
        group = items[s : s + args.batch_size]
        start = time.time()
        ys = model.inference_batch(
            [c for _, c in group], normalize_before=args.normalize_before,
            mesh=mesh)
        elapsed = time.time() - start
        audio = sum(len(y) for y in ys) / fs
        total_time += elapsed
        total_audio += audio
        pbar.set_postfix({"RTF": elapsed / audio})
        for (utt_id, _), y in zip(group, ys):
            write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                      fs, np.asarray(y)[:, 0])
    logging.info(
        "Finished batched generation of %d utterances (RTF = %.06f).",
        len(items), total_time / max(total_audio, 1e-9),
    )


def _decode_vqvae(args, config):
    """VQ-VAE wave2wave decode: encode -> decode (+PQMF), dump symbols.

    Behavioral reference: bin/decode.py:249-366 (per-utt encode/decode,
    discrete-symbol text dump).
    """
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.data.datasets import AudioDataset, AudioSCPDataset
    from parallelwavegan_tpu.models import get_model_class
    from parallelwavegan_tpu.ops.pqmf import PQMF
    from parallelwavegan_tpu.utils.checkpoint import load_generator_params

    fmt = config.get("format", "hdf5")
    use_local = config.get("use_local_condition", False)
    use_global = config.get("use_global_condition", False)
    if args.dumpdir is not None:
        cond_kw = {}
        if fmt == "hdf5":
            if use_local:
                cond_kw["local_query"] = "*.h5"
                cond_kw["local_load_fn"] = \
                    lambda x: read_hdf5(x, "local")  # noqa: E731
            if use_global:
                cond_kw["global_query"] = "*.h5"
                cond_kw["global_load_fn"] = \
                    lambda x: read_hdf5(x, "global")  # noqa: E731
            dataset = AudioDataset(
                args.dumpdir, audio_query="*.h5",
                audio_load_fn=lambda x: read_hdf5(x, "wave"),
                return_utt_id=True, **cond_kw,
            )
        else:
            if use_local:
                cond_kw["local_query"] = "*-local.npy"
                cond_kw["local_load_fn"] = np.load
            if use_global:
                cond_kw["global_query"] = "*-global.npy"
                cond_kw["global_load_fn"] = np.load
            dataset = AudioDataset(
                args.dumpdir, audio_query="*-wave.npy", audio_load_fn=np.load,
                return_utt_id=True, **cond_kw,
            )
    else:
        assert not (use_local or use_global), \
            "scp decode does not carry local/global conditioning"
        dataset = AudioSCPDataset(args.feats_scp, segments=args.segments,
                                  return_utt_id=True)
    logging.info("The number of features to be decoded = %d.", len(dataset))

    model = get_model_class("VQVAE")(**config["generator_params"])
    params, vars_g, _ = load_generator_params(args.checkpoint)
    # checkpoint leaves are numpy; jnp-ify so traced indexing works in jit
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": params, **vars_g}
    )
    subbands = config["generator_params"].get("in_channels", 1)
    pqmf = PQMF(subbands) if subbands > 1 else None

    encode = jax.jit(lambda x: model.apply(variables, x, method="encode"))
    decode = jax.jit(
        lambda i, l, g: model.apply(variables, i, l, g, method="decode"),
        static_argnames=(),
    ) if (use_local or use_global) else jax.jit(
        lambda i: model.apply(variables, i, method="decode")
    )

    # bucket utterance lengths so the whole set hits few compiled shapes
    downs = 1
    enc_conf = config["generator_params"].get("encoder_conf") or {}
    for s in enc_conf.get("downsample_scales", [4, 4, 2, 2]):
        downs *= s
    bucket = downs * subbands * 16

    os.makedirs(args.outdir, exist_ok=True)
    fs = config["sampling_rate"]
    total_rtf = 0.0
    with open(os.path.join(args.outdir, "text"), "w") as sym_f:
        for i in tqdm(range(len(dataset))):
            items = dataset[i]
            utt_id, audio = items[0], items[1]
            rest = list(items[2:])
            l = rest.pop(0) if use_local else None
            g = rest.pop(0) if use_global else None
            audio = np.asarray(audio, np.float32)
            t = len(audio)
            pad_t = -(-t // bucket) * bucket
            audio = np.pad(audio, (0, pad_t - t), mode="edge")
            x = jnp.asarray(audio)[None, :, None]
            if l is not None:
                # local features ride the hop grid; the latent grid is
                # prod(downsample_scales) x subbands samples per step, so
                # pad to the frame count the conditioned decoder consumes
                hop = config["hop_size"]
                n_l = pad_t // hop
                l = np.asarray(l, np.float32)
                l = np.pad(l, ((0, max(0, n_l - len(l))), (0, 0)),
                           mode="edge")[:n_l]
                l = jnp.asarray(l)[None]
            if g is not None:
                g = jnp.asarray(np.asarray(g).reshape(1), jnp.int32)
            start = time.time()
            if pqmf is not None:
                x = pqmf.analysis(x)
            indices = encode(x)
            if use_local or use_global:
                y = decode(indices, l, g)
            else:
                y = decode(indices)
            if pqmf is not None:
                y = pqmf.synthesis(y)
            y = np.asarray(jax.device_get(y))[0, :t, 0]
            rtf = (time.time() - start) / (len(y) / fs)
            total_rtf += rtf
            write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"), fs, y)
            n_sym_true = -(-t // (downs * subbands))
            syms = " ".join(
                str(int(s)) for s in np.asarray(indices)[0][:n_sym_true]
            )
            sym_f.write(f"{utt_id} {syms}\n")
    logging.info(
        "Finished generation of %d utterances (RTF = %.06f).",
        len(dataset), total_rtf / max(len(dataset), 1),
    )


if __name__ == "__main__":
    main()
