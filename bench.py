#!/usr/bin/env python
"""Benchmark harness: HiFi-GAN V1 decode RTF + full-scale training
throughput + MFU on one TPU chip.

Prints exactly one JSON line (driver contract: metric/value/unit/
vs_baseline), with the round-3 additions as extra keys:

  {"metric": "hifigan_v1_decode_rtf", "value": <RTF>, "unit": "rtf",
   "vs_baseline": <0.005 / RTF>,
   "decode_rtf": <RTF>,
   "train_steps_per_sec": <full-scale G+D steps/s>,
   "samples_per_sec": <steps/s * batch * batch_max_steps>,
   "train_flops_per_step": <XLA cost-analysis FLOPs of the two phase
                            programs (G program + D program)>,
   "mfu": <train_flops_per_step * steps/s / v5e peak (197e12 bf16)>}

Baselines: decode < 0.005 RTF (BASELINE.json north star); training
reference point is TITAN V ~1.45 steps/s implied by the 2.5M-step
schedule (BASELINE.md:43). MFU uses XLA's own cost analysis as the FLOP
count (includes elementwise ops, so it slightly overstates "model
FLOPs"), against the v5e bf16 peak of 197 TFLOP/s; with f32 convs the
achievable ceiling is lower, so this is a conservative utilization
number.

Training config: LJSpeech HiFi-GAN V1 (G 13.9M + MSMPD D 70.7M,
batch 16 x 8192 = egs/ljspeech/voc1/conf/hifigan.v1.yaml:101-102), the
same two-program jitted step the trainer runs.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_RTF = 0.005  # BASELINE.json north-star target per v5e chip
REF_TRAIN_STEPS_PER_SEC = 1.45  # TITAN V, BASELINE.md:43
V5E_PEAK_FLOPS = 197e12  # bf16 peak per chip
FS = 22050
HOP = 256

REPO = os.path.dirname(os.path.abspath(__file__))
CONF = os.path.join(REPO, "egs", "ljspeech", "voc1", "conf", "hifigan.v1.yaml")


def measure_decode():
    import jax
    import jax.numpy as jnp

    from parallelwavegan_tpu.models import get_model_class

    # LJSpeech HiFi-GAN V1 generator (egs/ljspeech/voc1/conf/hifigan.v1.yaml)
    G = get_model_class("HiFiGANGenerator")(
        in_channels=80,
        out_channels=1,
        channels=512,
        kernel_size=7,
        upsample_scales=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        # fused Pallas decode path (measured on v5e, frames=512):
        #   pure XLA                               11.4 ms  (RTF 0.0019)
        #   + packed MRF C<=64                     10.5 ms  (RTF 0.0018)
        #   + fused tail (incl. C=128 MRF fold)     7.3 ms  (RTF 0.0012)
        use_pallas_tail=jax.default_backend() == "tpu",
        pallas_tail_tile=2048,
    )

    frames = 512  # ~5.9 s of audio at 22.05 kHz / hop 256
    c = jnp.asarray(np.random.RandomState(0).randn(1, frames, 80), jnp.float32)
    params = jax.jit(G.init)(jax.random.key(0), c)

    # serially chain iterations on-device and fetch a scalar: immune to
    # async-dispatch and host<->device tunnel-latency artifacts
    n_iters = 20

    @jax.jit
    def run(params, c):
        def body(i, carry):
            y = G.apply(params, c + carry * 1e-12)
            return jnp.mean(y)

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    float(jax.device_get(run(params, c)))  # compile
    start = time.perf_counter()
    float(jax.device_get(run(params, c)))
    elapsed = (time.perf_counter() - start) / n_iters
    return elapsed / (frames * HOP / FS)


def measure_train(n_steps: int = 40):
    """Full-scale HiFi-GAN V1 G+D step: steps/s, samples/s, FLOPs/step."""
    import jax
    import jax.numpy as jnp
    import yaml

    from parallelwavegan_tpu.models import get_model_class
    from parallelwavegan_tpu.optimizers import build_optimizer_from_config
    from parallelwavegan_tpu.train.criterion import build_criterion
    from parallelwavegan_tpu.train.state import init_train_state
    from parallelwavegan_tpu.train.step import build_train_step

    with open(CONF) as f:
        config = yaml.safe_load(f)
    batch_size = config["batch_size"]           # 16
    batch_max_steps = config["batch_max_steps"]  # 8192
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
    batch = {
        "y": jnp.asarray(
            rs.randn(batch_size, batch_max_steps, 1) * 0.1, jnp.float32
        ),
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
    try:
        for prog in (g_step, d_step):
            compiled = prog.lower(state, batch, key).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops += float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0  # cost analysis unsupported on this backend

    def one_step(state, i):
        rng = jax.random.fold_in(key, i)
        state, m = g_step(state, batch, rng)
        state, m2 = d_step(state, batch, rng)
        return state, m2

    state, _ = one_step(state, 0)  # compile both programs
    jax.block_until_ready(state.params_g)
    start = time.perf_counter()
    for i in range(1, n_steps + 1):
        state, m = one_step(state, i)
    jax.block_until_ready(state.params_g)
    elapsed = (time.perf_counter() - start) / n_steps
    steps_per_sec = 1.0 / elapsed
    return steps_per_sec, steps_per_sec * batch_size * batch_max_steps, flops


def main():
    rtf = measure_decode()
    steps_per_sec, samples_per_sec, flops = measure_train()
    mfu = (flops * steps_per_sec / V5E_PEAK_FLOPS) if flops else None
    print(
        json.dumps(
            {
                "metric": "hifigan_v1_decode_rtf",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(BASELINE_RTF / rtf, 3),
                "decode_rtf": round(rtf, 6),
                "train_steps_per_sec": round(steps_per_sec, 3),
                "samples_per_sec": round(samples_per_sec, 1),
                "train_vs_ref_gpu": round(
                    steps_per_sec / REF_TRAIN_STEPS_PER_SEC, 2
                ),
                "train_flops_per_step": flops if flops else None,
                "mfu": round(mfu, 4) if mfu is not None else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
