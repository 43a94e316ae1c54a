#!/usr/bin/env python3
"""Attribute the non-MXU time of a full-scale train step (VERDICT r4 #8).

bf16 buys only ~1.2x end-to-end on the HiFi-GAN step, i.e. most of the
step is not MXU-rate-bound. This script isolates the non-conv costs the
roofline tools don't separate: the mel/STFT loss (fwd+grad), the
G-phase D forwards + adversarial/feat-match grads, and the two optax
updates — each timed device-chained (benchmarks/timing.py) with XLA
cost-analysis FLOPs. Together with profile_dprogram.py (D backward at
the HBM roof) this names where the roofline headroom goes.

Usage:
  python benchmarks/attribute_step.py [--config ...] [--iters 20]
      [--override mixed_precision=true]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from timing import chained_time

    from parallelwavegan_tpu.models import get_model_class
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--override", action="append", default=[])
    args = ap.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)
    for ov in args.override:
        key, _, val = ov.partition("=")
        config[key] = yaml.safe_load(val)

    mixed = bool(config.get("mixed_precision", False))
    act_dtype = jnp.bfloat16 if mixed else jnp.float32

    batch_size = config["batch_size"]
    bms = config["batch_max_steps"]
    frames = bms // config["hop_size"]
    gen = get_model_class(config["generator_type"])(
        **config["generator_params"])
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"])
    criterion = build_criterion(config)
    opt_g = build_optimizer_from_config(config, "generator")
    opt_d = build_optimizer_from_config(config, "discriminator")

    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.randn(batch_size, bms, 1) * 0.1, jnp.float32)
    batch = {
        "y": y,
        "c": jnp.asarray(
            rs.randn(batch_size, frames, config["num_mels"]), jnp.float32),
    }
    key = jax.random.key(0)
    gv = jax.jit(gen.init)(key, batch["c"])
    dv = jax.jit(dis.init)(key, batch["y"])
    state = init_train_state(
        gv["params"], dv["params"], opt_g, opt_d,
        vars_g={k: v for k, v in gv.items() if k != "params"},
        vars_d={k: v for k, v in dv.items() if k != "params"},
    )
    y_fake = (y + 0.01 * jnp.asarray(rs.randn(*y.shape), jnp.float32)
              ).astype(act_dtype)

    pieces = {}

    def add(name, fn, *fargs, perturb_arg=None):
        jitted = jax.jit(fn)
        try:
            t = chained_time(jitted, *fargs, iters=args.iters,
                             perturb_arg=perturb_arg)
        except Exception as exc:
            # a piece whose chained program exceeds the remote-compile
            # limit (HTTP 413) must not kill the rest of the breakdown;
            # retry with a smaller loop before giving up
            try:
                t = chained_time(jitted, *fargs,
                                 iters=max(4, args.iters // 4),
                                 perturb_arg=perturb_arg)
            except Exception:
                pieces[name] = {"error": repr(exc)[:160]}
                print(f"{name:16s} FAILED: {exc!r}"[:120], file=sys.stderr)
                return
        fl = 0.0
        try:
            ca = jitted.lower(*fargs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
        except Exception:
            pass
        pieces[name] = {
            "ms": round(t * 1e3, 3),
            "gflops": round(fl / 1e9, 2),
            "tf_per_s": round(fl / t / 1e12, 2) if fl else None,
        }
        print(f"{name:16s} {t * 1e3:8.2f} ms  {fl / 1e9:9.2f} GF",
              file=sys.stderr)

    gen_fwd = make_generator_forward(config, gen)
    dis_fwd = make_discriminator_forward(config, dis)

    def cast(tree):
        if not mixed:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    # generator forward alone (mixed casts applied as the step does)
    add("g_fwd",
        lambda p, b, r: gen_fwd(cast(p), state.vars_g, cast(b), r, True),
        state.params_g, batch, key)

    # mel/STFT aux loss forward+grad w.r.t. the generated wave
    from parallelwavegan_tpu.train.step import _generator_losses

    def mel_loss(y_):
        m = {}
        loss, _, _ = _generator_losses(
            criterion, config, y_.astype(jnp.float32), y, m)
        return loss

    add("aux_loss_grad", jax.grad(mel_loss), y_fake)

    # G-phase D forwards + adversarial (+feat-match) grads w.r.t. fake
    def _f32(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, tree)

    def adv_fm(y_):
        p_, _ = dis_fwd(cast(state.params_d), state.vars_d, y_, key, True)
        p_ = _f32(p_)
        loss = criterion.gen_adv(p_)
        if criterion.use_feat_match_loss:
            p, _ = dis_fwd(cast(state.params_d), state.vars_d,
                           cast(y), key, True)
            loss = loss + criterion.feat_match(p_, _f32(p))
        return loss

    add("advfm_loss_grad", jax.grad(adv_fm), y_fake)

    # optimizer updates on synthetic grads (shape = params)
    g_grads = jax.tree_util.tree_map(lambda p: p * 1e-3, state.params_g)
    d_grads = jax.tree_util.tree_map(lambda p: p * 1e-3, state.params_d)

    def opt_g_update(grads, opt_state, params):
        upd, new_state = opt_g.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, upd), new_state

    # perturb the GRADS (arg 0), not the default last-inexact arg
    # (params): the moment updates depend only on grads/opt_state, so a
    # params-only perturbation lets XLA hoist the whole optimizer out of
    # the timing loop (same LICM hazard class as timing.py's _scalar)
    add("optax_g", opt_g_update, g_grads, state.opt_g, state.params_g,
        perturb_arg=0)

    def opt_d_update(grads, opt_state, params):
        upd, new_state = opt_d.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, upd), new_state

    add("optax_d", opt_d_update, d_grads, state.opt_d, state.params_d,
        perturb_arg=0)

    # the two full phase programs for reference
    g_step = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=True, train_d=False, donate=False, increment_steps=False)
    d_step = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=False, train_d=True, donate=False, increment_steps=True)
    add("g_phase", g_step, state, batch, key)
    add("d_phase", d_step, state, batch, key)

    print(json.dumps({
        "config": os.path.basename(args.config),
        "mixed_precision": mixed,
        "batch": [batch_size, bms],
        "pieces": pieces,
    }))


if __name__ == "__main__":
    main()
