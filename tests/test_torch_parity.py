"""Golden numeric parity: converted reference torch weights -> same output.

Runs the reference implementation directly (PUBLIC content, behavior
oracle only) with random weights, converts the state dict through
convert.torch_checkpoint, and asserts our flax forward reproduces the
torch forward within float32 conv tolerance. This is the converter's
contract for pretrained-checkpoint compatibility (BASELINE.md).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# make the reference package importable despite its old scipy pin
import scipy.signal  # noqa: E402
import scipy.signal.windows as _w  # noqa: E402

if not hasattr(scipy.signal, "kaiser"):
    scipy.signal.kaiser = _w.kaiser

import os  # noqa: E402

if not os.path.isdir("/root/reference/parallel_wavegan"):
    pytest.skip(
        "reference implementation not available at /root/reference",
        allow_module_level=True,
    )
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parallelwavegan_tpu.convert.torch_checkpoint import (  # noqa: E402
    convert_state_dict,
)
from parallelwavegan_tpu.models import get_model_class  # noqa: E402

TOL = 2e-4


@pytest.fixture(autouse=True)
def _seed_torch():
    # torch inits use the global RNG; pin it so the spectral-norm scale
    # (near-singular at init) is reproducible across runs
    torch.manual_seed(0)


def _np_sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _max_err(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_hifigan_generator_parity():
    from parallel_wavegan.models import HiFiGANGenerator as Ref

    kwargs = dict(
        in_channels=10,
        channels=32,
        upsample_scales=[4, 4],
        upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 5],
        resblock_dilations=[[1, 3], [1, 3]],
    )
    ref = Ref(**kwargs).eval()
    c = np.random.RandomState(0).randn(2, 10, 20).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c)).numpy()

    params, _ = convert_state_dict("HiFiGANGenerator", kwargs, _np_sd(ref))
    ours = get_model_class("HiFiGANGenerator")(**kwargs)
    y = ours.apply({"params": params}, jnp.asarray(c.transpose(0, 2, 1)))
    assert _max_err(y_ref.transpose(0, 2, 1), y) < TOL


def test_melgan_generator_parity():
    from parallel_wavegan.models import MelGANGenerator as Ref

    kwargs = dict(in_channels=10, channels=32, upsample_scales=[4, 4], stacks=2)
    ref = Ref(**kwargs).eval()
    c = np.random.RandomState(1).randn(2, 10, 16).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c)).numpy()
    params, _ = convert_state_dict("MelGANGenerator", kwargs, _np_sd(ref))
    ours = get_model_class("MelGANGenerator")(**kwargs)
    y = ours.apply({"params": params}, jnp.asarray(c.transpose(0, 2, 1)))
    assert _max_err(y_ref.transpose(0, 2, 1), y) < TOL


def test_pwg_generator_parity():
    from parallel_wavegan.models import ParallelWaveGANGenerator as Ref

    kwargs = dict(
        layers=4,
        stacks=2,
        residual_channels=8,
        gate_channels=16,
        skip_channels=8,
        aux_channels=10,
        aux_context_window=2,
        upsample_params={"upsample_scales": [4, 4]},
    )
    ref = Ref(**kwargs).eval()
    rs = np.random.RandomState(2)
    t_frames = 6
    c = rs.randn(2, 10, t_frames + 4).astype(np.float32)  # +2*window
    z = rs.randn(2, 1, t_frames * 16).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(z), torch.from_numpy(c)).numpy()
    params, _ = convert_state_dict("ParallelWaveGANGenerator", kwargs, _np_sd(ref))
    ours = get_model_class("ParallelWaveGANGenerator")(**kwargs)
    y = ours.apply(
        {"params": params},
        jnp.asarray(z.transpose(0, 2, 1)),
        jnp.asarray(c.transpose(0, 2, 1)),
    )
    assert _max_err(y_ref.transpose(0, 2, 1), y) < TOL


def test_style_melgan_generator_parity():
    from parallel_wavegan.models import StyleMelGANGenerator as Ref

    kwargs = dict(
        in_channels=16,
        aux_channels=10,
        channels=16,
        noise_upsample_scales=[4, 2],
        upsample_scales=[2, 2, 1],
    )
    ref = Ref(**kwargs).eval()
    rs = np.random.RandomState(3)
    c = rs.randn(1, 10, 8).astype(np.float32)
    z = rs.randn(1, 16, 1).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c), torch.from_numpy(z)).numpy()
    params, _ = convert_state_dict("StyleMelGANGenerator", kwargs, _np_sd(ref))
    ours = get_model_class("StyleMelGANGenerator")(**kwargs)
    y = ours.apply(
        {"params": params},
        jnp.asarray(c.transpose(0, 2, 1)),
        jnp.asarray(z.transpose(0, 2, 1)),
    )
    assert _max_err(y_ref.transpose(0, 2, 1), y) < TOL


def test_pwg_discriminator_parity():
    from parallel_wavegan.models import ParallelWaveGANDiscriminator as Ref

    kwargs = dict(layers=4, conv_channels=16)
    ref = Ref(**kwargs).eval()
    x = np.random.RandomState(4).randn(2, 1, 256).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    params, _ = convert_state_dict("ParallelWaveGANDiscriminator", kwargs, _np_sd(ref))
    ours = get_model_class("ParallelWaveGANDiscriminator")(**kwargs)
    y = ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    assert _max_err(y_ref.transpose(0, 2, 1), y) < TOL


def test_hifigan_msmpd_parity():
    from parallel_wavegan.models import (
        HiFiGANMultiScaleMultiPeriodDiscriminator as Ref,
    )

    kwargs = dict(
        scales=2,
        periods=[2, 3],
        scale_discriminator_params={
            "channels": 8,
            "downsample_scales": [2, 1],
            "kernel_sizes": [15, 41, 5, 3],
            "max_downsample_channels": 16,
            "max_groups": 4,
        },
        period_discriminator_params={
            "channels": 4,
            "downsample_scales": [3, 1],
            "kernel_sizes": [5, 3],
            "max_downsample_channels": 8,
        },
    )
    ref = Ref(**kwargs).eval()
    x = np.random.RandomState(5).randn(2, 1, 256).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    params, extra = convert_state_dict(
        "HiFiGANMultiScaleMultiPeriodDiscriminator", kwargs, _np_sd(ref)
    )
    ours = get_model_class("HiFiGANMultiScaleMultiPeriodDiscriminator")(**kwargs)
    variables = {"params": params, **extra}
    outs = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)))
    assert len(outs) == len(outs_ref)
    # final layer of each discriminator; MSD is (B, 1, T) vs (B, T, 1),
    # MPD is flattened (out_channels=1 makes the flatten orders agree)
    for o_ref, o in zip(outs_ref, outs):
        ref_last = o_ref[-1].detach().numpy()
        ours_last = np.asarray(o[-1])
        if ref_last.ndim == 3:
            ref_last = ref_last.transpose(0, 2, 1)
        # relative: the spectral-norm D's init sigma is tiny, so absolute
        # magnitudes are huge and float32 noise scales with them
        scale = max(np.abs(ref_last).max(), 1.0)
        assert _max_err(ref_last.reshape(-1), ours_last.reshape(-1)) / scale < 1e-5


def test_melgan_msd_parity():
    from parallel_wavegan.models import MelGANMultiScaleDiscriminator as Ref

    kwargs = dict(
        scales=2,
        channels=8,
        downsample_scales=[2, 2],
        max_downsample_channels=32,
    )
    ref = Ref(**kwargs).eval()
    x = np.random.RandomState(6).randn(2, 1, 256).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    params, _ = convert_state_dict(
        "MelGANMultiScaleDiscriminator", kwargs, _np_sd(ref)
    )
    ours = get_model_class("MelGANMultiScaleDiscriminator")(**kwargs)
    outs = ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    for o_ref, o in zip(outs_ref, outs):
        err = _max_err(
            o_ref[-1].detach().numpy().transpose(0, 2, 1), np.asarray(o[-1])
        )
        assert err < TOL
