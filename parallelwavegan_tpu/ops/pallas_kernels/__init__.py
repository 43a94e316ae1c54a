"""Pallas TPU kernels for the hot vocoder blocks (XLA fallback always available)."""

import os

from parallelwavegan_tpu.ops.pallas_kernels.wavenet import (  # noqa: F401
    fused_gated_resblock,
    gated_resblock_xla,
)


def pallas_backend_ok() -> bool:
    """True when the fused kernels should actually run.

    The kernels are numerically equivalent to the XLA paths, so off-TPU
    they add nothing and would run in pallas interpret mode (orders of
    magnitude slower). Gating here keeps shipped configs that carry
    ``use_pallas_*`` flags (e.g. the LJSpeech PWG training configs)
    portable: a CPU/GPU consumer silently gets the XLA path.
    ``PALLAS_INTERPRET_OK=1`` forces the kernels anyway (used by the
    CPU equivalence tests that exercise the module-level wiring).
    """
    if os.environ.get("PALLAS_INTERPRET_OK"):
        return True
    import jax

    return jax.default_backend() == "tpu"
