"""STFT / mel numerics: pin the JAX STFT to torch.stft and the numpy mel
extractor's STFT to the same convention (center=True, reflect pad,
periodic hann padded-centered to fft_size)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from parallelwavegan_tpu.ops.stft import stft_magnitude, hann_window  # noqa: E402
from parallelwavegan_tpu.ops.mel import (  # noqa: E402
    _stft_magnitude_np,
    logmelfilterbank,
    mel_filterbank,
)


@pytest.mark.parametrize(
    "fft,hop,win", [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240), (128, 32, 128)]
)
def test_stft_magnitude_matches_torch(fft, hop, win):
    x = np.random.RandomState(0).randn(2, 4000).astype(np.float32)
    mag = stft_magnitude(jnp.array(x), fft, hop, win)

    t = torch.stft(
        torch.from_numpy(x), fft, hop, win, torch.hann_window(win),
        return_complex=True,
    )
    tmag = torch.sqrt(torch.clamp(t.real**2 + t.imag**2, min=1e-7))
    tmag = tmag.transpose(2, 1).numpy()  # (B, frames, bins)

    assert mag.shape == tmag.shape
    np.testing.assert_allclose(np.asarray(mag), tmag, rtol=1e-3, atol=1e-4)


def test_hann_window_matches_torch():
    w = np.asarray(hann_window(600))
    tw = torch.hann_window(600).numpy()
    np.testing.assert_allclose(w, tw, rtol=1e-6, atol=1e-6)


def test_numpy_stft_matches_jax_stft():
    x = np.random.RandomState(1).randn(3000).astype(np.float32)
    np_mag = _stft_magnitude_np(x, 1024, 256, None)
    jx_mag = np.asarray(stft_magnitude(jnp.array(x)[None], 1024, 256, 1024))[0]
    assert np_mag.shape == jx_mag.shape
    np.testing.assert_allclose(np_mag, jx_mag, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80)
    assert fb.shape == (80, 513)
    # every filter has positive area, filters are band-limited triangles
    assert (fb.sum(axis=1) > 0).all()
    assert (fb >= 0).all()
    # slaney normalization: peak of each filter roughly 2/(band width)
    # monotonically increasing center frequencies
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()


def test_logmelfilterbank_shapes_and_range():
    x = np.random.RandomState(2).randn(8000).astype(np.float32) * 0.1
    mel = logmelfilterbank(x, 16000, fft_size=1024, hop_size=256, num_mels=80)
    assert mel.shape == (8000 // 256 + 1, 80)
    assert np.isfinite(mel).all()


def test_conv_dft_matches_fft_forward_and_grad():
    """The TPU conv-DFT STFT path == batched rFFT path (value + grad)."""
    import jax

    from parallelwavegan_tpu.ops.stft import stft_magnitude

    x = jnp.asarray(np.random.RandomState(5).randn(2, 4000), jnp.float32)
    for n, hop, win in [(512, 128, 400), (1024, 256, 1024)]:
        a = stft_magnitude(x, n, hop, win, method="fft")
        b = stft_magnitude(x, n, hop, win, method="conv_dft")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-5)
        ga = jax.grad(lambda xx: jnp.sum(
            stft_magnitude(xx, n, hop, win, method="fft")))(x)
        gb = jax.grad(lambda xx: jnp.sum(
            stft_magnitude(xx, n, hop, win, method="conv_dft")))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-3, rtol=1e-4)
