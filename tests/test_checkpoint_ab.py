"""Waveform-level A/B: reference torch checkpoint -> load_model -> inference.

Saves a REAL reference-format torch pickle ({"model": {"generator": ...}}),
loads it through our load_model (format sniffing + on-the-fly conversion +
stats registration + PQMF attachment), and compares inference() output
against the reference module's own inference() on the same mel. This is
the end-to-end pretrained-checkpoint decode contract (BASELINE.md;
reference flow: bin/decode.py:124-149 + utils/utils.py:294-360).
"""

import os
import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

import scipy.signal  # noqa: E402
import scipy.signal.windows as _w  # noqa: E402

if not hasattr(scipy.signal, "kaiser"):
    scipy.signal.kaiser = _w.kaiser

if not os.path.isdir("/root/reference/parallel_wavegan"):
    pytest.skip(
        "reference implementation not available at /root/reference",
        allow_module_level=True,
    )
sys.path.insert(0, "/root/reference")

from parallelwavegan_tpu.utils.io import write_hdf5  # noqa: E402
from parallelwavegan_tpu.utils.model import load_model  # noqa: E402

TOL = 5e-4


@pytest.fixture(autouse=True)
def _seed_torch():
    torch.manual_seed(0)


def _write_experiment(tmp_path, gtype, gparams, ref, num_mels):
    ckpt = tmp_path / "checkpoint-1000steps.pkl"
    torch.save({"model": {"generator": ref.state_dict()},
                "steps": 1000, "epochs": 1}, str(ckpt))
    config = {
        "generator_type": gtype,
        "generator_params": dict(gparams),
        "sampling_rate": 16000,
        "format": "hdf5",
        "version": "0.6.0",
    }
    with open(tmp_path / "config.yml", "w") as f:
        yaml.dump(config, f)
    rs = np.random.RandomState(7)
    mean = rs.randn(num_mels).astype(np.float32)
    scale = (rs.rand(num_mels) + 0.5).astype(np.float32)
    write_hdf5(str(tmp_path / "stats.h5"), "mean", mean)
    write_hdf5(str(tmp_path / "stats.h5"), "scale", scale)
    return str(ckpt)


def test_hifigan_checkpoint_decode_ab(tmp_path):
    from parallel_wavegan.models import HiFiGANGenerator as Ref

    gparams = dict(
        in_channels=10,
        channels=32,
        upsample_scales=[4, 4],
        upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 5],
        resblock_dilations=[[1, 3], [1, 3]],
    )
    ref = Ref(**gparams).eval()
    ckpt = _write_experiment(tmp_path, "HiFiGANGenerator", gparams, ref, 10)

    model = load_model(ckpt)  # config + stats discovered from the dir
    # 64 frames = a bucket multiple: our padded forward is exact-length
    mel = np.random.RandomState(1).randn(64, 10).astype(np.float32)
    y_mine = np.asarray(model.inference(mel, normalize_before=True))

    ref.register_stats(str(tmp_path / "stats.h5"))
    ref.remove_weight_norm()
    with torch.no_grad():
        y_ref = ref.inference(torch.from_numpy(mel),
                              normalize_before=True).numpy()
    assert y_mine.shape == y_ref.shape
    np.testing.assert_allclose(y_mine, y_ref, atol=TOL)


def test_hifigan_checkpoint_decode_ab_pallas_tail(tmp_path):
    """Converted torch checkpoint through the fused-tail kernel path must
    decode the same waveform as the reference module."""
    from parallel_wavegan.models import HiFiGANGenerator as Ref

    gparams = dict(
        in_channels=10,
        channels=32,
        upsample_scales=[4, 4, 2, 2],
        upsample_kernel_sizes=[8, 8, 4, 4],
        resblock_kernel_sizes=[3, 5],
        resblock_dilations=[[1, 3], [1, 3]],
    )
    ref = Ref(**gparams).eval()
    ckpt = _write_experiment(tmp_path, "HiFiGANGenerator", gparams, ref, 10)

    import yaml as _yaml

    with open(tmp_path / "config.yml") as f:
        config = _yaml.safe_load(f)
    config["generator_params"]["use_pallas_tail"] = True
    config["generator_params"]["pallas_tail_tile"] = 64
    model = load_model(ckpt, config)
    mel = np.random.RandomState(3).randn(32, 10).astype(np.float32)
    y_mine = np.asarray(model.inference(mel, normalize_before=True))

    ref.register_stats(str(tmp_path / "stats.h5"))
    ref.remove_weight_norm()
    with torch.no_grad():
        y_ref = ref.inference(torch.from_numpy(mel),
                              normalize_before=True).numpy()
    assert y_mine.shape == y_ref.shape
    np.testing.assert_allclose(y_mine, y_ref, atol=TOL)


def test_multiband_melgan_checkpoint_decode_ab(tmp_path):
    """out_channels=4 path: PQMF attachment + synthesis must match."""
    from parallel_wavegan.layers import PQMF as RefPQMF
    from parallel_wavegan.models import MelGANGenerator as Ref

    gparams = dict(
        in_channels=10,
        out_channels=4,
        channels=32,
        upsample_scales=[4, 2],
        stacks=2,
    )
    ref = Ref(**gparams).eval()
    ckpt = _write_experiment(tmp_path, "MelGANGenerator", gparams, ref, 10)

    model = load_model(ckpt)
    assert model.pqmf is not None  # attached for out_channels > 1
    mel = np.random.RandomState(2).randn(64, 10).astype(np.float32)
    y_mine = np.asarray(model.inference(mel, normalize_before=True))

    ref.register_stats(str(tmp_path / "stats.h5"))
    ref.remove_weight_norm()
    ref.pqmf = RefPQMF(subbands=4)
    with torch.no_grad():
        y_ref = ref.inference(torch.from_numpy(mel),
                              normalize_before=True).numpy()
    assert y_mine.shape == y_ref.shape
    np.testing.assert_allclose(y_mine, y_ref, atol=TOL)
