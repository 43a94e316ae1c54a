"""Loss numerics: MRSTFT vs torch ground truth; mel loss pinned to the
numpy preprocessing extractor (the reference's test_mel_loss.py:16-46
strategy); adversarial/feat-match value checks."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from parallelwavegan_tpu.losses import (  # noqa: E402
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
    GeneratorAdversarialLoss,
    MelSpectrogram,
    MelSpectrogramLoss,
    MultiResolutionSTFTLoss,
    STFTLoss,
)
from parallelwavegan_tpu.ops.mel import logmelfilterbank  # noqa: E402


def _torch_stft_mag(x, fft, hop, win):
    t = torch.stft(torch.from_numpy(x), fft, hop, win, torch.hann_window(win),
                   return_complex=True)
    return torch.sqrt(torch.clamp(t.real**2 + t.imag**2, min=1e-7))


def test_stft_loss_matches_torch_reference_math():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6000).astype(np.float32)
    y = rng.randn(2, 6000).astype(np.float32)
    sc, mag = STFTLoss(1024, 120, 600)(jnp.array(x), jnp.array(y))

    xm = _torch_stft_mag(x, 1024, 120, 600)
    ym = _torch_stft_mag(y, 1024, 120, 600)
    sc_t = (torch.norm(ym - xm) / torch.norm(ym)).item()
    mag_t = torch.nn.functional.l1_loss(torch.log(ym), torch.log(xm)).item()

    assert abs(float(sc) - sc_t) < 1e-3
    assert abs(float(mag) - mag_t) < 1e-3


def test_mrstft_subband_flattening():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 2048, 4).astype(np.float32)  # (B, T, subbands)
    y = rng.randn(2, 2048, 4).astype(np.float32)
    loss = MultiResolutionSTFTLoss(
        fft_sizes=(384, 683, 171), hop_sizes=(30, 60, 10),
        win_lengths=(150, 300, 60),
    )
    sc, mag = loss(jnp.array(x), jnp.array(y))
    assert np.isfinite(float(sc)) and np.isfinite(float(mag))


def test_mel_spectrogram_matches_numpy_extractor():
    """JAX train-time mel == numpy preprocessing mel (internal parity pin)."""
    rng = np.random.RandomState(2)
    audio = (rng.randn(8192) * 0.2).astype(np.float32)
    fs = 16000

    np_mel = logmelfilterbank(audio, fs, fft_size=1024, hop_size=256,
                              num_mels=80, fmin=None, fmax=None)
    jx_mel = MelSpectrogram(fs=fs, fft_size=1024, hop_size=256, num_mels=80,
                            fmin=None, fmax=None)(jnp.array(audio)[None])

    assert np_mel.shape == jx_mel.shape[1:]
    np.testing.assert_allclose(np.asarray(jx_mel)[0], np_mel, rtol=1e-3, atol=2e-3)


def test_mel_loss_zero_for_identical():
    rng = np.random.RandomState(3)
    y = jnp.array(rng.randn(2, 4096).astype(np.float32))
    assert float(MelSpectrogramLoss(fs=16000)(y, y)) == 0.0


def test_generator_adversarial_loss_values():
    g = GeneratorAdversarialLoss(loss_type="mse")
    ones = jnp.ones((2, 10))
    zeros = jnp.zeros((2, 10))
    assert float(g(ones)) == 0.0
    assert float(g(zeros)) == 1.0
    # nested (feature-map) outputs use last element
    assert float(g([[zeros, ones]])) == 0.0
    # hinge
    gh = GeneratorAdversarialLoss(loss_type="hinge")
    assert float(gh(ones)) == -1.0


def test_discriminator_adversarial_loss_values():
    d = DiscriminatorAdversarialLoss(loss_type="mse")
    ones = jnp.ones((2, 10))
    zeros = jnp.zeros((2, 10))
    real, fake = d(zeros, ones)  # perfect D
    assert float(real) == 0.0 and float(fake) == 0.0
    real, fake = d(ones, zeros)  # fully fooled
    assert float(real) == 1.0 and float(fake) == 1.0
    dh = DiscriminatorAdversarialLoss(loss_type="hinge")
    real, fake = dh(-2.0 * ones, 2.0 * ones)
    assert float(real) == 0.0 and float(fake) == 0.0


def test_feature_match_loss():
    f1 = [jnp.ones((2, 4)), jnp.zeros((2, 4)), jnp.ones((2, 1))]
    f2 = [jnp.ones((2, 4)), jnp.ones((2, 4)), jnp.zeros((2, 1))]
    loss = FeatureMatchLoss()([f1], [f2])
    # layers excl. final: |1-1|=0 and |0-1|=1 -> avg 0.5
    assert abs(float(loss) - 0.5) < 1e-6
    loss_inc = FeatureMatchLoss(include_final_outputs=True)([f1], [f2])
    assert abs(float(loss_inc) - (0 + 1 + 1) / 3) < 1e-6
