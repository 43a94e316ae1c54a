"""load_model + InferenceModel behavior (native checkpoints)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.train.state import init_train_state
from parallelwavegan_tpu.utils.checkpoint import save_checkpoint
from parallelwavegan_tpu.utils.io import write_hdf5
from parallelwavegan_tpu.utils.model import load_model

GEN_PARAMS = {
    "in_channels": 8,
    "out_channels": 1,
    "channels": 16,
    "upsample_scales": [4, 4],
    "upsample_kernel_sizes": [8, 8],
    "resblock_kernel_sizes": [3],
    "resblock_dilations": [[1, 3]],
}


def _write_experiment(tmp_path):
    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": dict(GEN_PARAMS),
        "sampling_rate": 8000,
        "format": "hdf5",
    }
    G = get_model_class("HiFiGANGenerator")(**GEN_PARAMS)
    c = jnp.zeros((1, 8, 8))
    variables = G.init(jax.random.key(0), c)
    tx = optax.adam(1e-3)
    state = init_train_state(variables["params"], {}, tx, tx)
    ckpt = os.path.join(tmp_path, "checkpoint-10steps.pkl")
    save_checkpoint(ckpt, state)
    with open(os.path.join(tmp_path, "config.yml"), "w") as f:
        yaml.dump(config, f)
    mean = np.zeros(8, np.float32)
    scale = np.ones(8, np.float32)
    write_hdf5(os.path.join(tmp_path, "stats.h5"), "mean", mean)
    write_hdf5(os.path.join(tmp_path, "stats.h5"), "scale", scale + 1.0)
    return ckpt, G, variables


def test_load_model_and_bucketed_inference(tmp_path):
    ckpt, G, variables = _write_experiment(tmp_path)
    model = load_model(ckpt)
    assert model.mean is not None  # stats discovered from checkpoint dir

    rs = np.random.RandomState(0)
    for frames in (7, 33, 40):  # odd lengths exercise the bucket padding
        mel = rs.randn(frames, 8).astype(np.float32)
        y = model.inference(mel)
        assert y.shape == (frames * 16, 1)

    # normalize_before applies (x - mean) / scale before the forward
    mel = rs.randn(16, 8).astype(np.float32)
    y_plain = model.inference(mel * 2.0, normalize_before=True)  # scale=2
    y_direct = np.asarray(
        G.apply(variables, jnp.asarray(mel)[None])
    )[0]
    np.testing.assert_allclose(y_plain[: 8 * 16], y_direct[: 8 * 16], atol=2e-4)
