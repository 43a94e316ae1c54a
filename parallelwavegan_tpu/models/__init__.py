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
from parallelwavegan_tpu.models.melgan import (  # noqa: F401
    MelGANGenerator,
    MelGANDiscriminator,
    MelGANMultiScaleDiscriminator,
)
from parallelwavegan_tpu.models.parallel_wavegan import (  # noqa: F401
    ParallelWaveGANGenerator,
    ParallelWaveGANDiscriminator,
    ResidualParallelWaveGANDiscriminator,
)
from parallelwavegan_tpu.models.style_melgan import (  # noqa: F401
    DiscreteSymbolStyleMelGANGenerator,
    StyleMelGANGenerator,
    StyleMelGANDiscriminator,
)
from parallelwavegan_tpu.models.uhifigan import UHiFiGANGenerator  # noqa: F401
from parallelwavegan_tpu.models.vqvae import VQVAE  # noqa: F401
from parallelwavegan_tpu.models.discrete import (  # noqa: F401
    DiscreteSymbolDurationGenerator,
    DiscreteSymbolHiFiGANGenerator,
)

MODEL_REGISTRY = {
    "ParallelWaveGANGenerator": ParallelWaveGANGenerator,
    "ParallelWaveGANDiscriminator": ParallelWaveGANDiscriminator,
    "ResidualParallelWaveGANDiscriminator": ResidualParallelWaveGANDiscriminator,
    "MelGANGenerator": MelGANGenerator,
    "MelGANDiscriminator": MelGANDiscriminator,
    "MelGANMultiScaleDiscriminator": MelGANMultiScaleDiscriminator,
    "HiFiGANGenerator": HiFiGANGenerator,
    "HiFiGANPeriodDiscriminator": HiFiGANPeriodDiscriminator,
    "HiFiGANMultiPeriodDiscriminator": HiFiGANMultiPeriodDiscriminator,
    "HiFiGANScaleDiscriminator": HiFiGANScaleDiscriminator,
    "HiFiGANMultiScaleDiscriminator": HiFiGANMultiScaleDiscriminator,
    "HiFiGANMultiScaleMultiPeriodDiscriminator": HiFiGANMultiScaleMultiPeriodDiscriminator,
    "StyleMelGANGenerator": StyleMelGANGenerator,
    "StyleMelGANDiscriminator": StyleMelGANDiscriminator,
    "DiscreteSymbolStyleMelGANGenerator": DiscreteSymbolStyleMelGANGenerator,
    "UHiFiGANGenerator": UHiFiGANGenerator,
    "VQVAE": VQVAE,
    "DiscreteSymbolHiFiGANGenerator": DiscreteSymbolHiFiGANGenerator,
    "DiscreteSymbolDurationGenerator": DiscreteSymbolDurationGenerator,
}


def get_model_class(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model type {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
