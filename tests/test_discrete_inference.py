"""Discrete-model inference through load_model (numpy-checkpoint path)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.train.state import init_train_state
from parallelwavegan_tpu.utils.checkpoint import save_checkpoint
from parallelwavegan_tpu.utils.model import load_model

GEN_PARAMS = {
    "in_channels": 16,
    "channels": 32,
    "num_embs": 20,
    "num_spk_embs": 4,
    "spk_emb_dim": 16,
    "upsample_scales": [4, 4],
    "upsample_kernel_sizes": [8, 8],
    "resblock_kernel_sizes": [3],
    "resblock_dilations": [[1, 3]],
}


def test_discrete_hifigan_inference_from_checkpoint(tmp_path):
    config = {
        "generator_type": "DiscreteSymbolHiFiGANGenerator",
        "generator_params": dict(GEN_PARAMS),
        "sampling_rate": 16000,
        "format": "hdf5",
    }
    G = get_model_class(config["generator_type"])(**GEN_PARAMS)
    c = jnp.zeros((1, 8, 2), jnp.int32)
    variables = G.init(jax.random.key(0), c)
    tx = optax.adam(1e-3)
    state = init_train_state(variables["params"], {}, tx, tx)
    ckpt = os.path.join(tmp_path, "checkpoint-1steps.pkl")
    save_checkpoint(ckpt, state)
    with open(os.path.join(tmp_path, "config.yml"), "w") as f:
        yaml.dump(config, f)

    model = load_model(ckpt)
    rs = np.random.RandomState(0)
    tokens = rs.randint(0, 20, (12, 1))
    spk = rs.randint(0, 4, (12, 1))
    c_np = np.concatenate([tokens, spk], axis=1)
    y = model.inference(c_np)
    assert y.shape == (12 * 16, 1)
    assert np.all(np.isfinite(y))
