"""Model zoo registry.

The reference looks classes up by config string via getattr reflection
(/root/reference/parallel_wavegan/bin/train.py:1364-1373); here an explicit
registry dict serves the same YAML-facing names.
"""

from parallelwavegan_tpu.models.hifigan import (  # noqa: F401
    HiFiGANGenerator,
    HiFiGANPeriodDiscriminator,
    HiFiGANMultiPeriodDiscriminator,
    HiFiGANScaleDiscriminator,
    HiFiGANMultiScaleDiscriminator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)

MODEL_REGISTRY = {
    "HiFiGANGenerator": HiFiGANGenerator,
    "HiFiGANPeriodDiscriminator": HiFiGANPeriodDiscriminator,
    "HiFiGANMultiPeriodDiscriminator": HiFiGANMultiPeriodDiscriminator,
    "HiFiGANScaleDiscriminator": HiFiGANScaleDiscriminator,
    "HiFiGANMultiScaleDiscriminator": HiFiGANMultiScaleDiscriminator,
    "HiFiGANMultiScaleMultiPeriodDiscriminator": HiFiGANMultiScaleMultiPeriodDiscriminator,
}


def get_model_class(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model type {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
