#!/usr/bin/env python
"""Benchmark harness: HiFi-GAN V1 decode RTF on one TPU chip.

Prints exactly one JSON line:
  {"metric": "hifigan_v1_decode_rtf", "value": <RTF>, "unit": "rtf",
   "vs_baseline": <baseline / value>}

Baseline: BASELINE.json's target (HiFi-GAN V1 decode RTF < 0.005 per v5e
chip); vs_baseline > 1.0 means faster than target. The reference repo's
closest published figure is PWG RTF 0.016 on TITAN V (README.md:148-152).
"""

import json
import sys
import time

import numpy as np

BASELINE_RTF = 0.005  # BASELINE.json north-star target per v5e chip
FS = 22050
HOP = 256


def main():
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
    key = jax.random.key(0)

    params = jax.jit(G.init)(key, c)

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

    audio_seconds = frames * HOP / FS
    rtf = elapsed / audio_seconds
    print(
        json.dumps(
            {
                "metric": "hifigan_v1_decode_rtf",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(BASELINE_RTF / rtf, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
