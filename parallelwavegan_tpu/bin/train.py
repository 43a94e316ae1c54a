"""Training CLI (`parallel-wavegan-train`).

Behavioral reference: /root/reference/parallel_wavegan/bin/train.py:928-1550
(argparse surface, feature-flag derivation from generator_type
:1109-1117, dataset construction :1166-1300, model/loss/optimizer wiring
:1364-1493, --pretrain/--resume handling :1516-1537, finally-save
:1540-1546).

TPU design: no launcher/DDP — this one entry point runs single-chip or
data-parallel across all visible devices via the jitted sharded step;
multi-host runs call ``jax.distributed.initialize`` when
`distributed: true` is set (TPU runtime provides rendezvous).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import numpy as np
import yaml

import parallelwavegan_tpu
from parallelwavegan_tpu.data import Collater, DataLoader
from parallelwavegan_tpu.data.datasets import (
    AudioDataset,
    AudioMelDataset,
    AudioMelF0ExcitationDataset,
    AudioMelSCPDataset,
)
from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.optimizers import build_optimizer_from_config
from parallelwavegan_tpu.train import Trainer
from parallelwavegan_tpu.train.criterion import build_criterion
from parallelwavegan_tpu.utils.config import validate_local_condition
from parallelwavegan_tpu.train.state import init_train_state
from parallelwavegan_tpu.utils.io import read_hdf5


def feature_flags(config: dict) -> dict:
    """Derive input-feature flags from generator_type (train.py:1109-1117)."""
    generator_type = config.get("generator_type", "ParallelWaveGANGenerator")
    return {
        "use_noise_input": (
            "ParallelWaveGAN" in generator_type and "VQVAE" not in generator_type
        ),
        "use_aux_input": "VQVAE" not in generator_type,
        "use_duration": "Duration" in generator_type,
        "use_f0_and_excitation": generator_type == "UHiFiGANGenerator",
        "use_local_condition": config.get("use_local_condition", False),
        "use_global_condition": config.get("use_global_condition", False),
    }


def build_dataset(config: dict, args, split: str):
    """Dataset over a dump dir or scp pair for one split."""
    flags = feature_flags(config)
    rootdir = getattr(args, f"{split}_dumpdir", None)
    wav_scp = getattr(args, f"{split}_wav_scp", None)
    batch_max_steps = config["batch_max_steps"]
    hop_size = config.get("hop_size")  # absent for wave2wav VQ configs
    win = config["generator_params"].get("aux_context_window", 0)
    mel_threshold = (
        batch_max_steps // hop_size + 2 * win if hop_size else None
    )
    if rootdir is not None:
        local_kw = {}
        if config.get("format", "hdf5") == "hdf5":
            audio_query, mel_query = "*.h5", "*.h5"
            audio_load_fn = lambda x: read_hdf5(x, "wave")  # noqa: E731
            mel_load_fn = lambda x: read_hdf5(x, "feats")  # noqa: E731
            if flags["use_local_condition"]:
                local_kw["local_query"] = "*.h5"
                local_kw["local_load_fn"] = lambda x: read_hdf5(x, "local")  # noqa: E731
            if flags["use_global_condition"]:
                local_kw["global_query"] = "*.h5"
                local_kw["global_load_fn"] = lambda x: read_hdf5(x, "global")  # noqa: E731
        else:
            audio_query, mel_query = "*-wave.npy", "*-feats.npy"
            audio_load_fn = np.load
            mel_load_fn = np.load
            if flags["use_local_condition"]:
                local_kw["local_query"] = "*-local.npy"
                local_kw["local_load_fn"] = np.load
            if flags["use_global_condition"]:
                local_kw["global_query"] = "*-global.npy"
                local_kw["global_load_fn"] = np.load
        if flags["use_f0_and_excitation"]:
            return AudioMelF0ExcitationDataset(
                rootdir,
                audio_query=audio_query,
                audio_load_fn=audio_load_fn,
                mel_query=mel_query,
                mel_load_fn=mel_load_fn,
                mel_length_threshold=mel_threshold
                if config.get("remove_short_samples", False)
                else None,
                allow_cache=config.get("allow_cache", False),
            )
        if not flags["use_aux_input"]:
            if flags["use_local_condition"]:
                # VQ local conditioning rides the AudioMel dataset (the
                # 'mel' slot holds the local features; ref train.py:1219)
                return AudioMelDataset(
                    rootdir,
                    audio_query=audio_query,
                    audio_load_fn=audio_load_fn,
                    mel_query=local_kw["local_query"],
                    mel_load_fn=local_kw["local_load_fn"],
                    **(
                        {
                            "global_query": local_kw["global_query"],
                            "global_load_fn": local_kw["global_load_fn"],
                        }
                        if flags["use_global_condition"]
                        else {}
                    ),
                    allow_cache=config.get("allow_cache", False),
                )
            return AudioDataset(
                rootdir,
                audio_query=audio_query,
                audio_load_fn=audio_load_fn,
                **(
                    {
                        "global_query": local_kw["global_query"],
                        "global_load_fn": local_kw["global_load_fn"],
                    }
                    if flags["use_global_condition"]
                    else {}
                ),
                allow_cache=config.get("allow_cache", False),
            )
        return AudioMelDataset(
            rootdir,
            audio_query=audio_query,
            audio_load_fn=audio_load_fn,
            mel_query=mel_query,
            mel_load_fn=mel_load_fn,
            mel_length_threshold=mel_threshold
            if config.get("remove_short_samples", False)
            else None,
            allow_cache=config.get("allow_cache", False),
        )
    feats_scp = getattr(args, f"{split}_feats_scp")
    segments = getattr(args, f"{split}_segments", None)
    return AudioMelSCPDataset(
        wav_scp,
        feats_scp,
        segments=segments,
        mel_length_threshold=mel_threshold
        if config.get("remove_short_samples", False)
        else None,
        allow_cache=config.get("allow_cache", False),
    )


def main():
    parser = argparse.ArgumentParser(description="Train a vocoder (TPU-native).")
    parser.add_argument("--train-wav-scp", default=None, type=str)
    parser.add_argument("--train-feats-scp", default=None, type=str)
    parser.add_argument("--train-segments", default=None, type=str)
    parser.add_argument("--train-dumpdir", default=None, type=str)
    parser.add_argument("--dev-wav-scp", default=None, type=str)
    parser.add_argument("--dev-feats-scp", default=None, type=str)
    parser.add_argument("--dev-segments", default=None, type=str)
    parser.add_argument("--dev-dumpdir", default=None, type=str)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--pretrain", default="", type=str)
    parser.add_argument("--resume", default="", type=str)
    parser.add_argument("--verbose", type=int, default=1)
    parser.add_argument("--rank", "--local_rank", dest="rank", default=0, type=int)
    parser.add_argument(
        "--profile", default=None, type=str, metavar="START:STOP",
        help="capture a jax.profiler trace over the given step window "
             "(e.g. 50:60) into <outdir>/profile",
    )
    parser.add_argument("--compilation-cache", default=None,
                        help="persistent XLA compile-cache dir (default "
                             "~/.cache/parallelwavegan_tpu/xla; resumed "
                             "runs skip recompiling the train step)")
    parser.add_argument("--no-compilation-cache", action="store_true")
    args = parser.parse_args()
    if args.profile is not None:
        start, stop = args.profile.split(":")
        args.profile_steps = [int(start), int(stop)]
    del args.profile
    if not args.no_compilation_cache:
        from parallelwavegan_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)
    del args.compilation_cache, args.no_compilation_cache

    logging.basicConfig(
        level=logging.DEBUG if args.verbose > 1 else
        (logging.INFO if args.verbose > 0 else logging.WARN),
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
        stream=sys.stdout,
    )

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)
    config.update(vars(args))
    config["version"] = parallelwavegan_tpu.__version__
    validate_local_condition(config)

    if config.get("distributed", False):
        # must run before ANYTHING initializes the XLA backend (including
        # jax.process_count()). On TPU pods all three are None and JAX
        # auto-detects; under the launch shim (--backend cpu) they come
        # from the JAX_* env vars it sets per child.
        np_, pid = os.environ.get("JAX_NUM_PROCESSES"), os.environ.get(
            "JAX_PROCESS_ID")
        try:
            jax.distributed.initialize(
                coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
                num_processes=int(np_) if np_ is not None else None,
                process_id=int(pid) if pid is not None else None,
                # default 300 s: a rank that compiles slowly on a loaded CI
                # machine can lag past the shutdown barrier of a rank that
                # finished a short run — give stragglers longer
                shutdown_timeout_seconds=1200,
            )
        except RuntimeError as e:
            # ONLY tolerate double-init (single-proc tests); a real
            # rendezvous failure must not degrade to N independent
            # unsharded runs racing on the same outdir
            if "already initialized" not in str(e):
                raise
            logging.warning("jax.distributed.initialize skipped: %s", e)

    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "config.yml"), "w") as f:
        yaml.dump(config, f, Dumper=yaml.Dumper)
    for key, value in config.items():
        logging.info("%s = %s", key, value)

    gen_type = config["generator_type"]
    flags = feature_flags(config)

    train_dataset = build_dataset(config, args, "train")
    logging.info("The number of training files = %d.", len(train_dataset))
    dev_dataset = None
    if args.dev_dumpdir is not None or args.dev_feats_scp is not None:
        dev_dataset = build_dataset(config, args, "dev")
        logging.info("The number of development files = %d.", len(dev_dataset))

    win = config["generator_params"].get("aux_context_window", 0)
    collater = Collater(
        batch_max_steps=config["batch_max_steps"],
        hop_size=config.get("hop_size"),
        aux_context_window=win,
        use_noise_input=flags["use_noise_input"],
        use_aux_input=flags["use_aux_input"],
        use_duration=flags["use_duration"],
        use_f0_and_excitation=flags["use_f0_and_excitation"],
        use_local_condition=flags["use_local_condition"],
        use_global_condition=flags["use_global_condition"],
        rng=np.random.default_rng(config.get("seed", 0) + jax.process_index()),
    )
    per_host_batch = config["batch_size"] // jax.process_count()
    train_loader = DataLoader(
        train_dataset,
        collater,
        batch_size=per_host_batch,
        shuffle=True,
        seed=config.get("seed", 0),
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
        num_workers=config.get("num_workers", 1),
    )
    dev_loader = None
    if dev_dataset is not None:
        # dev is host-sharded too (reference shards dev with
        # DistributedSampler, train.py:1326-1341): eval runs on all
        # processes with global collectives
        dev_loader = DataLoader(
            dev_dataset, collater, batch_size=per_host_batch, shuffle=False,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
            num_workers=config.get("num_workers", 1),
        )

    # models
    generator = get_model_class(gen_type)(**config["generator_params"])
    discriminator = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"]
    )
    criterion = build_criterion(config)
    opt_g_tx = build_optimizer_from_config(config, "generator")
    opt_d_tx = build_optimizer_from_config(config, "discriminator")

    # parameter init with a template batch
    key = jax.random.key(config.get("seed", 0))
    kg, kd, krwd = jax.random.split(key, 3)
    template = collater([train_dataset[i] for i in range(min(2, len(train_dataset)))])
    template = {k: v[:1] for k, v in template.items()}

    def _gen_init_args(gtype, batch, cfg):
        if gtype == "ParallelWaveGANGenerator":
            return (batch["z"], batch["c"])
        if gtype == "UHiFiGANGenerator":
            return (batch["excitation"], batch["c"])
        if gtype == "DiscreteSymbolDurationGenerator":
            return (batch["c"], batch["ds"])
        if gtype == "VQVAE":
            subbands = cfg["generator_params"].get("in_channels", 1)
            y = batch["y"]
            if subbands > 1:
                from parallelwavegan_tpu.ops.pqmf import PQMF

                y = PQMF(subbands, **cfg.get("pqmf_params", {})).analysis(y)
            return (y, batch.get("local"), batch.get("global"))
        return (batch["c"],)

    import jax.numpy as jnp

    tbatch = {k: jnp.asarray(v) for k, v in template.items()}
    g_vars = jax.jit(
        lambda r: generator.init(
            {"params": r, "noise": r}, *_gen_init_args(gen_type, tbatch, config)
        )
    )(kg)
    y_tmpl = tbatch["y"]
    d_vars = jax.jit(
        lambda r: discriminator.init({"params": r, "rwd": r}, y_tmpl)
    )(kd)
    params_g = g_vars["params"]
    vars_g = {k: v for k, v in g_vars.items() if k != "params"}
    params_d = d_vars["params"]
    vars_d = {k: v for k, v in d_vars.items() if k != "params"}

    n_params_g = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params_g))
    n_params_d = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params_d))
    logging.info("Generator parameters: %.2fM", n_params_g / 1e6)
    logging.info("Discriminator parameters: %.2fM", n_params_d / 1e6)

    state = init_train_state(params_g, params_d, opt_g_tx, opt_d_tx,
                             vars_g=vars_g, vars_d=vars_d)

    trainer = Trainer(
        config=config,
        state=state,
        generator=generator,
        discriminator=discriminator,
        criterion=criterion,
        opt_g_tx=opt_g_tx,
        opt_d_tx=opt_d_tx,
        train_loader=train_loader,
        dev_loader=dev_loader,
        outdir=args.outdir,
    )

    if args.pretrain:
        trainer.load_checkpoint(args.pretrain, load_only_params=True)
        logging.info("Successfully loaded parameters from %s.", args.pretrain)
    if args.resume:
        trainer.load_checkpoint(args.resume)
        logging.info("Successfully resumed from %s.", args.resume)

    try:
        trainer.run()
    except KeyboardInterrupt:
        trainer.save_checkpoint(
            os.path.join(args.outdir, f"checkpoint-{trainer.steps}steps.pkl")
        )
        logging.info("Successfully saved checkpoint @ %d steps.", trainer.steps)


if __name__ == "__main__":
    main()
