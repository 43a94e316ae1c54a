#!/usr/bin/env python3
"""Roofline breakdown of the HiFi-GAN discriminator program (VERDICT r3 #7).

The trainer's D phase (train/step.py, train_d=True) is: re-run G forward,
MSMPD on real + fake, adversarial D loss, backward, optax update. This
script times each piece separately on the real chip and reports achieved
TF/s and arithmetic intensity (FLOPs / bytes from XLA cost analysis) so
every sub-discriminator can be classified compute-bound vs bandwidth-bound
against the v5e roofline (197 TF/s bf16 / ~98 TF/s f32, ~819 GB/s HBM).

Pieces:
  period_P{p}       one HiFiGANPeriodDiscriminator fwd (1D->2D reshape, P=p)
  scale_{i}         one HiFiGANScaleDiscriminator fwd (grouped convs, scale i)
  mpd_fwd/msd_fwd   the two halves of the MSMPD forward
  msmpd_fwd         full D forward
  d_loss_grad       d(adv real+fake loss)/d(params_d)  (no G re-run)
  g_rerun_fwd       generator forward (the D phase re-runs it)
  d_phase           the trainer's full jitted D program

Usage:
  python benchmarks/profile_dprogram.py \
      --config egs/ljspeech/voc1/conf/hifigan.v1.yaml [--iters 30]
      [--override mixed_precision=true]

Reference structure: /root/reference/parallel_wavegan/models/hifigan.py
:270-381 (period D), :384-474 (scale D); trainer D phase
/root/reference/parallel_wavegan/bin/train.py:285-340.
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


def _cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (
            float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)),
        )
    except Exception:
        return 0.0, 0.0


def _time(jitted, *args, iters=30):
    # device-chained: queued dispatch under-reports on the tunneled
    # runtime (passthrough outputs resolve early) — see timing.py
    from timing import chained_time

    return chained_time(jitted, *args, iters=iters)


def main():
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.models import get_model_class
    from parallelwavegan_tpu.models.hifigan import (
        HiFiGANPeriodDiscriminator,
        HiFiGANScaleDiscriminator,
    )
    from parallelwavegan_tpu.optimizers import build_optimizer_from_config
    from parallelwavegan_tpu.train.criterion import build_criterion
    from parallelwavegan_tpu.train.state import init_train_state
    from parallelwavegan_tpu.train.step import (
        build_train_step,
        make_discriminator_forward,
        make_generator_forward,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config",
        default=os.path.join(
            REPO, "egs", "ljspeech", "voc1", "conf", "hifigan.v1.yaml"
        ),
    )
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

    batch_size = config["batch_size"]
    batch_max_steps = config["batch_max_steps"]
    frames = batch_max_steps // config["hop_size"]

    gen = get_model_class(config["generator_type"])(
        **config["generator_params"]
    )
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"]
    )
    criterion = build_criterion(config)
    opt_g = build_optimizer_from_config(config, "generator")
    opt_d = build_optimizer_from_config(config, "discriminator")

    rs = np.random.RandomState(0)
    y = jnp.asarray(
        rs.randn(batch_size, batch_max_steps, 1) * 0.1, jnp.float32
    )
    batch = {
        "y": y,
        "c": jnp.asarray(
            rs.randn(batch_size, frames, config["num_mels"]), jnp.float32
        ),
    }
    key = jax.random.key(0)
    g_vars = jax.jit(gen.init)(key, batch["c"])
    d_vars = jax.jit(dis.init)(key, batch["y"])
    state = init_train_state(
        g_vars["params"], d_vars["params"], opt_g, opt_d,
        vars_g={k: v for k, v in g_vars.items() if k != "params"},
        vars_d={k: v for k, v in d_vars.items() if k != "params"},
    )

    pieces = {}

    def add(name, fn, *fargs):
        t = _time(fn, *fargs, iters=args.iters)
        fl, by = _cost(fn, *fargs)
        pieces[name] = {
            "ms": round(t * 1e3, 3),
            "gflops": round(fl / 1e9, 2),
            "tf_per_s": round(fl / t / 1e12, 2) if fl else None,
            "gb": round(by / 1e9, 3),
            "gb_per_s": round(by / t / 1e9, 1) if by else None,
            "flops_per_byte": round(fl / by, 1) if by else None,
        }
        print(
            f"{name:14s} {t * 1e3:8.2f} ms  {fl / 1e9:9.2f} GF  "
            f"{(fl / t / 1e12) if fl else 0:6.2f} TF/s  "
            f"{(by / t / 1e9) if by else 0:6.1f} GB/s  "
            f"AI={fl / by if by else 0:6.1f}",
            file=sys.stderr,
        )

    # --- isolated sub-discriminators (fresh init; same param shapes as
    # inside the MSMPD, so timings are representative) --------------------
    pd_params = dict(config["discriminator_params"][
        "period_discriminator_params"])
    for period in config["discriminator_params"]["periods"]:
        sub = HiFiGANPeriodDiscriminator(**pd_params, period=period)
        v = jax.jit(sub.init)(key, y)
        f = jax.jit(lambda p, x, m=sub: m.apply(p, x)[-1])
        add(f"period_P{period}", f, v, y)

    sd_params = dict(config["discriminator_params"][
        "scale_discriminator_params"])
    n_scales = config["discriminator_params"]["scales"]
    pool_k = config["discriminator_params"][
        "scale_downsample_pooling_params"]["kernel_size"]
    pool_s = config["discriminator_params"][
        "scale_downsample_pooling_params"]["stride"]
    pool_p = config["discriminator_params"][
        "scale_downsample_pooling_params"]["padding"]
    x_s = y
    for i in range(n_scales):
        sub = HiFiGANScaleDiscriminator(**sd_params)
        v = jax.jit(sub.init)(key, x_s)
        f = jax.jit(lambda p, x, m=sub: m.apply(p, x)[-1])
        add(f"scale_{i}", f, v, x_s)
        # AvgPool1d(k=4, s=2, pad=2) between scales
        xp = jnp.pad(x_s, ((0, 0), (pool_p, pool_p), (0, 0)), mode="edge")
        from jax import lax

        x_s = lax.reduce_window(
            xp, 0.0, lax.add,
            (1, pool_k, 1), (1, pool_s, 1), "valid",
        ) / pool_k

    # --- composed programs ----------------------------------------------
    dis_fwd = make_discriminator_forward(config, dis)
    d_full = jax.jit(
        lambda p, x, r: dis_fwd(p, state.vars_d, x, r, False)[0]
    )
    add("msmpd_fwd", d_full, state.params_d, y, key)

    from parallelwavegan_tpu.losses.adversarial_loss import (
        DiscriminatorAdversarialLoss,
    )

    adv = DiscriminatorAdversarialLoss(
        **config.get("discriminator_adv_loss_params", {})
    )

    y_fake = y + 0.01 * jnp.asarray(
        rs.randn(*y.shape), jnp.float32
    )

    def d_loss(p, y_real, y_f, r):
        pr, _ = dis_fwd(p, state.vars_d, y_real, r, True)
        pf, _ = dis_fwd(p, state.vars_d, y_f, r, True)
        real_l, fake_l = adv(pf, pr)
        return real_l + fake_l

    add("d_loss_grad", jax.jit(jax.grad(d_loss)),
        state.params_d, y, y_fake, key)

    gen_fwd = make_generator_forward(config, gen)
    add("g_rerun_fwd",
        jax.jit(lambda p, b, r: gen_fwd(p, state.vars_g, b, r, True)),
        state.params_g, batch, key)

    d_phase = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=False, train_d=True, donate=False, increment_steps=True,
    )
    add("d_phase", d_phase, state, batch, key)

    print(json.dumps({
        "config": os.path.basename(args.config),
        "batch": [batch_size, batch_max_steps],
        "mixed_precision": bool(config.get("mixed_precision", False)),
        "pieces": pieces,
    }))


if __name__ == "__main__":
    main()
