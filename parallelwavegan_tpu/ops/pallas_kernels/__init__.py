"""Pallas TPU kernels for the hot vocoder blocks (XLA fallback always available)."""

from parallelwavegan_tpu.ops.pallas_kernels.wavenet import (  # noqa: F401
    fused_gated_resblock,
    gated_resblock_xla,
)
