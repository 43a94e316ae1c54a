"""bf16 mixed-precision training mode (``mixed_precision: true``).

Model forwards/backwards run in bf16 (params cast at use) while master
params, optimizer state and losses stay f32 — no loss scaling needed
(bf16 keeps f32's exponent range). Pins: the step runs, master params
stay f32, and the first-step losses agree with the f32 step to bf16
rounding (~1e-2 relative), on both a weight-normed and a spectral-normed
discriminator.
"""

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.optimizers import build_optimizer_from_config
from parallelwavegan_tpu.train.criterion import build_criterion
from parallelwavegan_tpu.train.state import init_train_state
from parallelwavegan_tpu.train.step import build_train_step

CONFIG = {
    "sampling_rate": 8000,
    "hop_size": 64,
    "num_mels": 10,
    "generator_type": "HiFiGANGenerator",
    "generator_params": {
        "in_channels": 10, "out_channels": 1, "channels": 16,
        "kernel_size": 3, "upsample_scales": [4, 4, 4],
        "upsample_kernel_sizes": [8, 8, 8],
        "resblock_kernel_sizes": [3], "resblock_dilations": [[1, 3]],
    },
    "discriminator_type": "HiFiGANMultiScaleMultiPeriodDiscriminator",
    "discriminator_params": {
        "scales": 1, "periods": [2],
        "follow_official_norm": True,  # spectral-norm path under bf16
        "scale_discriminator_params": {
            "in_channels": 1, "out_channels": 1,
            "kernel_sizes": [5, 5, 5, 3],
            "channels": 4, "max_downsample_channels": 8,
            "max_groups": 2, "downsample_scales": [2, 2],
        },
        "period_discriminator_params": {
            "in_channels": 1, "out_channels": 1, "kernel_sizes": [3, 3],
            "channels": 4, "downsample_scales": [2, 2],
            "max_downsample_channels": 8,
        },
    },
    "use_stft_loss": True,
    "stft_loss_params": {
        "fft_sizes": [64, 128],
        "hop_sizes": [16, 32],
        "win_lengths": [32, 64],
    },
    "use_feat_match_loss": True,
    "lambda_aux": 1.0,
    "lambda_adv": 1.0,
    "lambda_feat_match": 2.0,
    "generator_optimizer_type": "Adam",
    "generator_optimizer_params": {"lr": 1.0e-4},
    "discriminator_optimizer_type": "Adam",
    "discriminator_optimizer_params": {"lr": 1.0e-4},
    "generator_grad_norm": 10,
    "discriminator_grad_norm": 1,
}


def _run(config, steps=2):
    gen = get_model_class(config["generator_type"])(
        **config["generator_params"]
    )
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"]
    )
    criterion = build_criterion(config)
    opt_g = build_optimizer_from_config(config, "generator")
    opt_d = build_optimizer_from_config(config, "discriminator")
    rs = np.random.RandomState(0)
    batch = {
        "y": jnp.asarray(rs.randn(2, 1024, 1) * 0.1, jnp.float32),
        "c": jnp.asarray(rs.randn(2, 16, 10), jnp.float32),
    }
    key = jax.random.key(0)
    g_vars = gen.init(key, batch["c"])
    d_vars = dis.init(key, batch["y"])
    state = init_train_state(
        g_vars["params"], d_vars["params"], opt_g, opt_d,
        vars_g={k: v for k, v in g_vars.items() if k != "params"},
        vars_d={k: v for k, v in d_vars.items() if k != "params"},
    )
    step = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=True, train_d=True, donate=False,
    )
    all_metrics = []
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.key(10 + i))
        all_metrics.append({k: float(v) for k, v in metrics.items()})
    return state, all_metrics


def test_bf16_step_runs_and_keeps_f32_master_state():
    config = dict(CONFIG, mixed_precision=True)
    state, metrics = _run(config)
    for m in metrics:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    # master params and optimizer state stay f32; spectral u/v stay f32
    for leaf in jax.tree_util.tree_leaves(
        (state.params_g, state.params_d, state.opt_g, state.opt_d,
         state.vars_d)
    ):
        if hasattr(leaf, "dtype") and jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_bf16_first_step_tracks_f32():
    _, m32 = _run(dict(CONFIG), steps=1)
    _, m16 = _run(dict(CONFIG, mixed_precision=True), steps=1)
    for k in m32[0]:
        a, b = m32[0][k], m16[0][k]
        assert abs(a - b) / max(abs(a), 0.1) < 3e-2, (k, a, b)


def test_bf16_100_step_drift_is_bounded():
    """Multi-step quality pin (VERDICT r3 #9): 100 GAN optimizer updates
    under bf16 stay within a bounded envelope of the f32 trajectory.

    bf16 rounding compounds through both optimizers, so bitwise tracking
    is not expected; the pin is (a) early steps track tightly (rounding
    has not compounded), (b) the reconstruction (STFT) losses end within
    a modest band of f32's, and (c) both trajectories actually improve
    the reconstruction, i.e. bf16 trains, not just runs.
    """
    _, m32 = _run(dict(CONFIG), steps=100)
    _, m16 = _run(dict(CONFIG, mixed_precision=True), steps=100)
    keys = ("spectral_convergence_loss", "log_stft_magnitude_loss")
    # (a) first 10 steps: tight tracking on every logged loss
    for i in range(10):
        for k in m32[i]:
            a, b = m32[i][k], m16[i][k]
            assert abs(a - b) / max(abs(a), 0.1) < 1e-1, (i, k, a, b)
    # (b) final reconstruction losses within 20% (averaged over the last
    # 10 steps to smooth per-step GAN noise)
    for k in keys:
        a = np.mean([m[k] for m in m32[-10:]])
        b = np.mean([m[k] for m in m16[-10:]])
        assert abs(a - b) / max(abs(a), 1e-3) < 0.2, (k, a, b)
    # (c) both modes improved the reconstruction over the run
    for ms in (m32, m16):
        first = np.mean([m[keys[1]] for m in ms[:5]])
        last = np.mean([m[keys[1]] for m in ms[-5:]])
        assert last < first, (first, last)
