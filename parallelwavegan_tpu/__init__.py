"""TPU-native GAN neural-vocoder framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kan-bayashi/ParallelWaveGAN (reference at /root/reference): the full vocoder
model zoo (Parallel WaveGAN, MelGAN, Multi-band MelGAN, HiFi-GAN,
StyleMelGAN + discrete-symbol / U-Net / VQ-VAE variants), the
multi-resolution STFT / mel / adversarial / feature-matching loss suite,
PQMF sub-band analysis/synthesis, and the config-driven
preprocess -> compute-statistics -> normalize -> train -> decode pipeline.

Design stance (TPU-first, not a port):
  * NTC (batch, time, channel) tensor layout everywhere so XLA maps convs
    onto the MXU without transposes.
  * One jitted train step (G fwd + losses + D fwd + both optimizer updates)
    data-parallel over a ``jax.sharding.Mesh`` -- XLA collectives replace
    the reference's NCCL/apex DDP stack.
  * Functional losses, optax optimizers, single-file checkpoints with a
    lossless converter from the reference's torch pickles.
"""

__version__ = "0.1.0"
