#!/usr/bin/env python3
"""Decode-RTF measurement for every generator family on one TPU chip.

Closes the reference's headline decode table (README.md:148-183: PWG
0.016, MelGAN 0.002, MB-MelGAN 0.001 on TITAN V) with measured numbers
for this framework. Methodology matches bench.py: the jitted forward is
chained ``--iters`` times on-device through a scalar carry and a single
scalar is fetched, so async dispatch and the host<->device tunnel latency
cannot leak into the timing.

Usage:
  python benchmarks/measure_decode.py [--families hifigan,melgan,...]
      [--frames 512] [--iters 20]

Prints one JSON line per family:
  {"family": ..., "config": ..., "decode_rtf": ..., "ms_per_call": ...,
   "ref_titan_v_rtf": ... | null}
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

CONF = os.path.join(REPO, "egs", "ljspeech", "voc1", "conf")

# reference README.md:148-183 (TITAN V RTFs); None = not published
FAMILIES = {
    "hifigan": ("hifigan.v1.yaml", None),
    "melgan": ("melgan.v1.yaml", 0.002),
    "mb_melgan": ("multi_band_melgan.v2.yaml", 0.001),
    "pwg": ("parallel_wavegan.v1.yaml", 0.016),
    "style_melgan": ("style_melgan.v1.yaml", None),
}


def build(config, on_tpu: bool, fused: bool = True):
    """Generator + (input maker, forward fn over (params, inputs))."""
    from parallelwavegan_tpu.models import get_model_class
    from parallelwavegan_tpu.ops.pqmf import PQMF

    import jax
    import jax.numpy as jnp

    gtype = config.get("generator_type", "ParallelWaveGANGenerator")
    gp = {
        k.replace("upsample_kernal_sizes", "upsample_kernel_sizes"): v
        for k, v in config["generator_params"].items()
    }
    # fused decode kernels (no-op off TPU; equivalence pinned in tests)
    on_tpu = on_tpu and fused
    if gtype == "HiFiGANGenerator" and on_tpu:
        gp.update(use_pallas_tail=True, pallas_tail_tile=2048)
    if gtype == "ParallelWaveGANGenerator" and on_tpu:
        gp.update(use_pallas_stack=True)
    if gtype == "MelGANGenerator" and on_tpu:
        gp.update(use_pallas_stacks=True)
    if gtype == "StyleMelGANGenerator" and on_tpu:
        gp.update(use_pallas_tade=True)
    gen = get_model_class(gtype)(**gp)

    out_ch = gp.get("out_channels", 1)
    pqmf = PQMF(subbands=out_ch) if out_ch > 1 else None

    def make_inputs(frames, rng):
        # Mel conditioning width: StyleMelGAN/PWG condition on aux_channels
        # (in_channels is their noise dim); MelGAN/HiFiGAN take mels as
        # in_channels directly.
        if gtype in ("ParallelWaveGANGenerator", "StyleMelGANGenerator"):
            mel_ch = gp.get("aux_channels", 80)
        else:
            mel_ch = gp.get("in_channels", 80)
        c = jnp.asarray(rng.randn(1, frames, mel_ch), jnp.float32)
        if gtype == "ParallelWaveGANGenerator":
            win = gp.get("aux_context_window", 2)
            c = jnp.pad(c, ((0, 0), (win, win), (0, 0)), mode="edge")
            up = int(np.prod(config["generator_params"].get(
                "upsample_params", {}).get("upsample_scales", [4, 4, 4, 4])))
            z = jnp.asarray(rng.randn(1, frames * up, 1), jnp.float32)
            return (z, c), frames
        if gtype == "StyleMelGANGenerator":
            nuf = gen.noise_upsample_factor
            noise_len = -(-frames // nuf)
            z = jnp.asarray(
                rng.randn(1, noise_len, gp.get("in_channels", 128)),
                jnp.float32)
            c = c[:, : noise_len * nuf, :] if frames >= noise_len * nuf else \
                jnp.pad(c, ((0, 0), (0, noise_len * nuf - frames), (0, 0)))
            # the timed call synthesizes noise_len*nuf frames of audio, not
            # `frames` — return the real length so RTF is not overstated
            return (c, z), noise_len * nuf
        return (c,), frames

    def forward(params, inputs):
        y = gen.apply(params, *inputs)
        if pqmf is not None:
            y = pqmf.synthesis(y)
        return y

    return gen, make_inputs, forward


def measure(name, conf_file, ref_rtf, frames: int, iters: int,
            fused: bool = True):
    import jax
    import jax.numpy as jnp

    with open(os.path.join(CONF, conf_file)) as f:
        config = yaml.safe_load(f)
    fs, hop = config["sampling_rate"], config["hop_size"]
    on_tpu = jax.default_backend() == "tpu"
    gen, make_inputs, forward = build(config, on_tpu, fused=fused)

    rng = np.random.RandomState(0)
    inputs, eff_frames = make_inputs(frames, rng)
    params = jax.jit(gen.init)(jax.random.key(0), *inputs)

    @jax.jit
    def run(params, inputs):
        def body(i, carry):
            bumped = (inputs[0] + carry * 1e-12,) + tuple(inputs[1:])
            return jnp.mean(forward(params, bumped))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(jax.device_get(run(params, inputs)))  # compile
    start = time.perf_counter()
    float(jax.device_get(run(params, inputs)))
    per_call = (time.perf_counter() - start) / iters

    audio_seconds = eff_frames * hop / fs
    rtf = per_call / audio_seconds
    result = {
        "family": name,
        "config": conf_file,
        "decode_rtf": round(rtf, 6),
        "ms_per_call": round(per_call * 1e3, 3),
        "audio_seconds": round(audio_seconds, 3),
        "ref_titan_v_rtf": ref_rtf,
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the fused Pallas decode kernels (XLA A/B)")
    args = ap.parse_args()
    for name in args.families.split(","):
        conf_file, ref = FAMILIES[name.strip()]
        measure(name.strip(), conf_file, ref, args.frames, args.iters,
                fused=not args.no_fused)


if __name__ == "__main__":
    main()
