"""Sine excitation generator for source-filter vocoders (UHiFiGAN path).

Behavioral reference: /root/reference/parallel_wavegan/layers/sine.py:7-146
(SineGen: F0 -> multi-harmonic sines with cumsum phase + random initial
phase per harmonic, voiced/unvoiced mask by threshold, noise floor; all
no-grad).

TPU design: a pure function over an explicit PRNG key (replaces torch's
global RNG); the phase accumulation is one ``jnp.cumsum`` in float32 on the
*wrapped* per-sample phase increments, mirroring the reference's
overflow-guard trick. The pulse-train branch (flag_for_pulse, used only
inside PulseGen which the reference never instantiates from any config) is
not carried over.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass(frozen=True)
class SineGen:
    """F0 (B, T, 1) -> (sine (B, T, dim), uv (B, T, 1), noise (B, T, dim))."""

    samp_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @property
    def dim(self) -> int:
        return self.harmonic_num + 1

    def __call__(self, f0: Array, rng: Array):
        harmonics = jnp.arange(1, self.dim + 1, dtype=f0.dtype)
        f0_buf = f0 * harmonics[None, None, :]  # (B, T, dim)

        rad_values = (f0_buf / self.samp_rate) % 1.0
        k_ini, k_noise = jax.random.split(rng)
        rand_ini = jax.random.uniform(k_ini, (f0.shape[0], self.dim))
        rand_ini = rand_ini.at[:, 0].set(0.0)  # fundamental keeps zero phase
        rad_values = rad_values.at[:, 0, :].add(rand_ini)

        # wrap the running phase into [0, 1) before the sin to keep float32
        # precision over long signals (reference's cumsum_shift trick,
        # sine.py:73-85, has the same effect)
        phase = jnp.cumsum(rad_values, axis=1) % 1.0
        sines = jnp.sin(2.0 * jnp.pi * phase)

        uv = (f0 > self.voiced_threshold).astype(f0.dtype)
        sine_waves = sines * self.sine_amp
        noise_amp = uv * self.noise_std + (1.0 - uv) * self.sine_amp / 3.0
        noise = noise_amp * jax.random.normal(k_noise, sine_waves.shape, f0.dtype)
        sine_waves = sine_waves * uv + noise
        return jax.lax.stop_gradient(sine_waves), uv, jax.lax.stop_gradient(noise)
