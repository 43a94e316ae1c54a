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


def _enable_persistent_compilation_cache() -> None:
    """Point JAX at an on-disk compilation cache (best effort).

    Compiles on the tunneled TPU take minutes and the remote compile
    service can wedge mid-session; a persistent cache makes every repeat
    program load from local disk instead. Opt out or relocate with
    JAX_COMPILATION_CACHE_DIR (honored by JAX itself when set).
    """
    import os

    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is not None:
            return  # user already configured a cache programmatically
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_compilation"),
        )
        # cache aggressively, but skip sub-second trivial compiles so the
        # cache dir doesn't accumulate thousands of tiny CI/test programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_enable_persistent_compilation_cache()
