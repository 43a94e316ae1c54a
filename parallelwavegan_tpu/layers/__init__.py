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
from parallelwavegan_tpu.layers.residual_stack import ResidualStack  # noqa: F401
from parallelwavegan_tpu.layers.upsample import (  # noqa: F401
    ConvInUpsampleNetwork,
    UpsampleNetwork,
    stretch_time,
)
from parallelwavegan_tpu.layers.tade import (  # noqa: F401
    TADELayer,
    TADEResBlock,
    instance_norm_1d,
)
from parallelwavegan_tpu.layers.sine import SineGen  # noqa: F401
from parallelwavegan_tpu.layers.vq import VQCodebook  # noqa: F401
from parallelwavegan_tpu.ops.pqmf import PQMF  # noqa: F401  (reference
# exposes PQMF as a layer; here the filterbank lives in ops)
from parallelwavegan_tpu.layers.duration import (  # noqa: F401
    DurationPredictor,
    LayerNorm,
    VariancePredictor,
    length_regulator,
    repeat_by_durations_np,
)
