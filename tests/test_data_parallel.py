"""Data-parallel training over the 8-virtual-device CPU mesh.

The reference has no distributed test at all (SURVEY.md §4); here the
sharded batch + replicated state path runs the real fused step across 8
devices and must match the single-device result (same math, psum'd grads
are exact for a replicated model on an evenly sharded batch).
"""

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.optimizers import build_optimizer_from_config
from parallelwavegan_tpu.parallel.mesh import batch_sharding, make_mesh, shard_state
from parallelwavegan_tpu.train.criterion import build_criterion
from parallelwavegan_tpu.train.state import init_train_state
from parallelwavegan_tpu.train.step import build_train_step

CONFIG = {
    "generator_type": "MelGANGenerator",
    "generator_params": {
        "in_channels": 10, "out_channels": 1, "channels": 32,
        "upsample_scales": [4, 4], "stacks": 1,
    },
    "discriminator_type": "ParallelWaveGANDiscriminator",
    "discriminator_params": {"layers": 3, "conv_channels": 8},
    "use_stft_loss": True,
    "stft_loss_params": {
        "fft_sizes": [64], "hop_sizes": [16], "win_lengths": [32],
    },
    "lambda_aux": 1.0, "lambda_adv": 1.0,
    "generator_optimizer_type": "Adam",
    "generator_optimizer_params": {"lr": 1e-4},
    "discriminator_optimizer_type": "Adam",
    "discriminator_optimizer_params": {"lr": 1e-4},
}


def _setup():
    gen = get_model_class(CONFIG["generator_type"])(**CONFIG["generator_params"])
    dis = get_model_class(CONFIG["discriminator_type"])(
        **CONFIG["discriminator_params"]
    )
    criterion = build_criterion(dict(CONFIG))
    og = build_optimizer_from_config(CONFIG, "generator")
    od = build_optimizer_from_config(CONFIG, "discriminator")
    rs = np.random.RandomState(0)
    batch = {
        "y": rs.randn(8, 512, 1).astype(np.float32),
        "c": rs.randn(8, 32, 10).astype(np.float32),
    }
    key = jax.random.key(0)
    gv = gen.init(key, jnp.asarray(batch["c"][:1]))
    dv = dis.init(key, jnp.asarray(batch["y"][:1]))
    state = init_train_state(gv["params"], dv["params"], og, od)
    step = build_train_step(
        CONFIG, gen, dis, criterion, og, od,
        train_g=True, train_d=True, donate=False,
    )
    return state, step, batch


def test_data_parallel_step_matches_single_device():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    state, step, batch = _setup()

    # single device
    b1 = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, m1 = step(state, b1, jax.random.key(1))
    s1, m1 = step(s1, b1, jax.random.key(2))

    # 8-device data parallel: batch sharded, state replicated
    mesh = make_mesh(jax.devices()[:8])
    sharding = batch_sharding(mesh)
    b8 = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    s8 = shard_state(state, mesh)
    s8, m8 = step(s8, b8, jax.random.key(1))
    s8, m8 = step(s8, b8, jax.random.key(2))

    np.testing.assert_allclose(
        float(m1["generator_loss"]), float(m8["generator_loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params_g)),
        jax.tree_util.tree_leaves(jax.device_get(s8.params_g)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5)
