"""Loss suite (pure functions over jnp arrays).

Mirrors /root/reference/parallel_wavegan/losses/__init__.py:1-5 capability:
MultiResolutionSTFTLoss, STFTLoss, MelSpectrogramLoss, adversarial losses,
FeatureMatchLoss, DurationPredictorLoss.
"""

from parallelwavegan_tpu.losses.stft_loss import (  # noqa: F401
    STFTLoss,
    MultiResolutionSTFTLoss,
    spectral_convergence_loss,
    log_stft_magnitude_loss,
)
from parallelwavegan_tpu.losses.mel_loss import (  # noqa: F401
    MelSpectrogram,
    MelSpectrogramLoss,
)
from parallelwavegan_tpu.losses.adversarial_loss import (  # noqa: F401
    GeneratorAdversarialLoss,
    DiscriminatorAdversarialLoss,
)
from parallelwavegan_tpu.losses.feat_match_loss import FeatureMatchLoss  # noqa: F401
