#!/usr/bin/env python3
"""Per-family device-memory footprint of the full-scale train step.

The reference's config headers state GPU memory budgets ("requires
~12 GB GPU memory", parallel_wavegan.v1.yaml:4; "~4 GB", melgan.v1.yaml
:4; "~8 GB", multi_band_melgan.v2.yaml:4). This reports the TPU-side
equivalent from XLA's own compiled memory analysis: argument bytes
(params + optimizer state + batch) and peak temp allocation for the two
phase programs — the numbers that size a chip for a config.

Usage:
  python benchmarks/measure_memory.py [--families hifigan,mb_melgan,...]
      [--mixed]

Prints one JSON line per family.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CONF = os.path.join(REPO, "egs", "ljspeech", "voc1", "conf")

# (config, one-chip batch) — the BASELINE.md full-scale shapes
FAMILIES = {
    "hifigan": ("hifigan.v1.yaml", 16),
    "melgan": ("melgan.v1.yaml", 8),
    "mb_melgan": ("multi_band_melgan.v2.yaml", 64),
    "pwg": ("parallel_wavegan.v1.yaml", 6),
    "style_melgan": ("style_melgan.v1.yaml", 32),
}


def measure(conf_file: str, batch_size: int, mixed: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import yaml

    from parallelwavegan_tpu.models import get_model_class
    from parallelwavegan_tpu.optimizers import build_optimizer_from_config
    from parallelwavegan_tpu.train.criterion import build_criterion
    from parallelwavegan_tpu.train.state import init_train_state
    from parallelwavegan_tpu.train.step import build_train_step

    with open(os.path.join(CONF, conf_file)) as f:
        config = yaml.safe_load(f)
    if mixed:
        config["mixed_precision"] = True
    bms = config["batch_max_steps"]
    acw = config["generator_params"].get("aux_context_window", 0)
    frames = bms // config["hop_size"] + 2 * acw
    gen = get_model_class(config["generator_type"])(
        **config["generator_params"])
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"])
    criterion = build_criterion(config)
    opt_g = build_optimizer_from_config(config, "generator")
    opt_d = build_optimizer_from_config(config, "discriminator")

    rs = np.random.RandomState(0)
    batch = {
        "y": jnp.asarray(rs.randn(batch_size, bms, 1) * 0.1, jnp.float32),
        "c": jnp.asarray(
            rs.randn(batch_size, frames, config["num_mels"]), jnp.float32),
    }
    key = jax.random.key(0)
    init_rngs = {"params": key, "noise": key, "rwd": key}
    if config["generator_type"] == "ParallelWaveGANGenerator":
        batch["z"] = jnp.asarray(
            rs.randn(batch_size, bms, 1), jnp.float32)
        gv = jax.jit(gen.init)(init_rngs, batch["z"], batch["c"])
    elif config["generator_type"].startswith("StyleMelGAN"):
        gv = jax.jit(gen.init)(init_rngs, batch["c"], None)
    else:
        gv = jax.jit(gen.init)(init_rngs, batch["c"])
    dv = jax.jit(dis.init)(init_rngs, batch["y"])
    state = init_train_state(
        gv["params"], dv["params"], opt_g, opt_d,
        vars_g={k: v for k, v in gv.items() if k != "params"},
        vars_d={k: v for k, v in dv.items() if k != "params"})

    out = {}
    for phase, (tg, td) in (("g", (True, False)), ("d", (False, True))):
        step = build_train_step(
            config, gen, dis, criterion, opt_g, opt_d,
            train_g=tg, train_d=td, donate=False,
            increment_steps=not tg)
        compiled = step.lower(state, batch, key).compile()
        ma = compiled.memory_analysis()
        out[f"{phase}_temp_mb"] = round(
            ma.temp_size_in_bytes / 1e6, 1)
        out[f"{phase}_args_mb"] = round(
            ma.argument_size_in_bytes / 1e6, 1)
        out[f"{phase}_output_mb"] = round(
            ma.output_size_in_bytes / 1e6, 1)
    # state (params + opt) lives once; peak ≈ args + max(phase temps)
    out["peak_mb"] = round(
        max(out["g_args_mb"] + out["g_temp_mb"],
            out["d_args_mb"] + out["d_temp_mb"]), 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--mixed", action="store_true")
    args = ap.parse_args()
    for fam in args.families.split(","):
        conf_file, bs = FAMILIES[fam]
        res = measure(conf_file, bs, args.mixed)
        print(json.dumps({
            "family": fam, "config": conf_file, "batch_size": bs,
            "mixed_precision": bool(args.mixed), **res,
        }), flush=True)


if __name__ == "__main__":
    main()
