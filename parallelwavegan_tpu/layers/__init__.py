"""Primitive NN layers (flax.linen, NTC layout).

Mirrors the capability set of /root/reference/parallel_wavegan/layers/
(registry at layers/__init__.py:1-8 there), re-designed for TPU:
convs run through ``lax.conv_general_dilated`` in NTC layout and
normalizations are explicit parameterizations instead of torch hooks.
"""

from parallelwavegan_tpu.layers.convs import (  # noqa: F401
    Conv1d,
    ConvTranspose1d,
    CausalConv1d,
    CausalConvTranspose1d,
    Conv2dP,
    leaky_relu,
)
from parallelwavegan_tpu.layers.residual_block import (  # noqa: F401
    HiFiGANResidualBlock,
    WaveNetResidualBlock,
)
