"""Core functional ops (convolutions, STFT, mel, PQMF) in NTC layout."""

from parallelwavegan_tpu.ops.conv import (  # noqa: F401
    conv1d,
    conv_transpose1d,
    causal_conv1d_pad,
)
from parallelwavegan_tpu.ops.stft import stft_magnitude, hann_window  # noqa: F401
from parallelwavegan_tpu.ops.mel import mel_filterbank, logmelfilterbank  # noqa: F401
