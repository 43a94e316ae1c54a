#!/usr/bin/env python3
"""Per-phase / per-piece timing breakdown of one full-scale train step.

Decomposes the two-program jitted GAN step (train/step.py) into separately
compiled pieces and times each on the real chip, with XLA cost-analysis
FLOPs per piece so achieved TF/s can be compared against the v5e roofline
(197 TF/s bf16, ~98 TF/s f32). Pieces:

  g_fwd        generator forward only
  g_aux_grad   d(aux losses)/d(params_g)      (G fwd + stft/mel losses + bwd)
  d_fwd        discriminator forward only
  g_phase      the trainer's full G program   (adds D fwds + adv/fm + optax)
  d_phase      the trainer's full D program   (re-run G + D real/fake + optax)

Usage:
  python benchmarks/profile_step.py --config egs/.../multi_band_melgan.v2.yaml
      [--batch-size N] [--iters 30] [--override k=v]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _time(jitted, *args, iters=30):
    # device-chained: queued dispatch under-reports on the tunneled
    # runtime (passthrough outputs resolve early) — see timing.py
    from timing import chained_time

    return chained_time(jitted, *args, iters=iters)


def main():
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.models import get_model_class
    from parallelwavegan_tpu.optimizers import build_optimizer_from_config
    from parallelwavegan_tpu.train.criterion import build_criterion
    from parallelwavegan_tpu.train.state import init_train_state
    from parallelwavegan_tpu.train.step import (
        build_train_step,
        make_discriminator_forward,
        make_generator_forward,
        _generator_losses,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--override", action="append", default=[])
    args = ap.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)
    for ov in args.override:
        key, _, val = ov.partition("=")
        node, parts = config, key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    if args.batch_size:
        config["batch_size"] = args.batch_size
    batch_size = config["batch_size"]
    batch_max_steps = config["batch_max_steps"]
    frames = batch_max_steps // config["hop_size"]

    gen = get_model_class(config["generator_type"])(**config["generator_params"])
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"]
    )
    criterion = build_criterion(config)
    opt_g = build_optimizer_from_config(config, "generator")
    opt_d = build_optimizer_from_config(config, "discriminator")

    rs = np.random.RandomState(0)
    batch = {
        "y": jnp.asarray(
            rs.randn(batch_size, batch_max_steps, 1) * 0.1, jnp.float32
        ),
        "c": jnp.asarray(
            rs.randn(batch_size, frames, config["num_mels"]), jnp.float32
        ),
    }
    if config["generator_type"] == "ParallelWaveGANGenerator":
        batch["z"] = jnp.asarray(
            rs.randn(batch_size, batch_max_steps, 1), jnp.float32
        )
    key = jax.random.key(0)
    # dict rngs: StyleMelGAN draws z via "noise" at init and its D draws
    # random windows via "rwd"; other families ignore the extra streams.
    init_rngs = {"params": key, "noise": key, "rwd": key}
    if config["generator_type"] == "ParallelWaveGANGenerator":
        g_init_args = (batch["z"], batch["c"])
    elif config["generator_type"].startswith("StyleMelGAN"):
        g_init_args = (batch["c"], None)
    else:
        g_init_args = (batch["c"],)
    g_vars = jax.jit(gen.init)(init_rngs, *g_init_args)
    d_vars = jax.jit(dis.init)(init_rngs, batch["y"])
    state = init_train_state(
        g_vars["params"], d_vars["params"], opt_g, opt_d,
        vars_g={k: v for k, v in g_vars.items() if k != "params"},
        vars_d={k: v for k, v in d_vars.items() if k != "params"},
    )

    gen_fwd = make_generator_forward(config, gen)
    dis_fwd = make_discriminator_forward(config, dis)

    g_fwd = jax.jit(
        lambda p, b, r: gen_fwd(p, state.vars_g, b, r, True)
    )

    def aux_loss_fn(p, b, r):
        y_ = gen_fwd(p, state.vars_g, b, r, True)
        m = {}
        loss, _, _ = _generator_losses(criterion, config, y_, b["y"], m)
        return loss

    g_aux_grad = jax.jit(jax.grad(aux_loss_fn))
    d_fwd = jax.jit(
        lambda p, y, r: dis_fwd(p, state.vars_d, y, r, False)[0]
    )

    g_phase = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=True, train_d=False, donate=False, increment_steps=False,
    )
    d_phase = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=False, train_d=True, donate=False, increment_steps=True,
    )

    pieces = {}

    def add(name, fn, *fargs):
        t = _time(fn, *fargs, iters=args.iters)
        fl = _flops(fn, *fargs)
        pieces[name] = {
            "ms": round(t * 1e3, 3),
            "gflops": round(fl / 1e9, 2),
            "tf_per_s": round(fl / t / 1e12, 2) if fl else None,
        }
        print(f"{name:12s} {t * 1e3:8.2f} ms  {fl / 1e9:9.2f} GF  "
              f"{(fl / t / 1e12) if fl else 0:6.2f} TF/s", file=sys.stderr)

    add("g_fwd", g_fwd, state.params_g, batch, key)
    add("g_aux_grad", g_aux_grad, state.params_g, batch, key)
    add("d_fwd", d_fwd, state.params_d, batch["y"], key)
    add("g_phase", g_phase, state, batch, key)
    add("d_phase", d_phase, state, batch, key)
    total = pieces["g_phase"]["ms"] + pieces["d_phase"]["ms"]
    print(json.dumps({
        "config": os.path.basename(args.config),
        "batch": [batch_size, batch_max_steps],
        "mixed_precision": bool(config.get("mixed_precision", False)),
        "pieces": pieces,
        "step_ms": round(total, 2),
        "steps_per_sec": round(1e3 / total, 2),
    }))


if __name__ == "__main__":
    main()
