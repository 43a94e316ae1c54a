"""Regression: the GAN step must actually LEARN with the spectral-norm D.

Guards the spectral-norm init fix: with sigma ~ u^T W v of independent
random vectors, the first-scale discriminator exploded (~1e10 losses),
poisoned Adam's second moment, and froze the generator. This overfits a
fixed batch for a few dozen steps and requires a clear mel-loss drop and
sane adversarial magnitudes throughout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.optimizers import build_optimizer_from_config
from parallelwavegan_tpu.train.criterion import build_criterion
from parallelwavegan_tpu.train.state import init_train_state
from parallelwavegan_tpu.train.step import build_train_step


def test_hifigan_msmpd_overfit_decreases_mel_loss():
    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 10, "channels": 16,
            "upsample_scales": [4, 4], "upsample_kernel_sizes": [8, 8],
            "resblock_kernel_sizes": [3], "resblock_dilations": [[1, 3]],
        },
        "discriminator_type": "HiFiGANMultiScaleMultiPeriodDiscriminator",
        "discriminator_params": {
            "scales": 2,
            "scale_discriminator_params": {
                "channels": 8, "downsample_scales": [2, 1],
                "kernel_sizes": [15, 41, 5, 3],
                "max_downsample_channels": 16, "max_groups": 4,
            },
            "follow_official_norm": True,  # first scale D = spectral norm
            "periods": [2, 3],
            "period_discriminator_params": {
                "channels": 4, "downsample_scales": [3, 1],
                "kernel_sizes": [5, 3], "max_downsample_channels": 8,
            },
        },
        "use_stft_loss": False,
        "use_mel_loss": True,
        "mel_loss_params": {
            "fs": 8000, "fft_size": 256, "hop_size": 64, "win_length": None,
            "window": "hann", "num_mels": 10, "fmin": 0, "fmax": 4000,
            "log_base": None,
        },
        "use_feat_match_loss": True,
        "lambda_aux": 45.0, "lambda_adv": 1.0, "lambda_feat_match": 2.0,
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 2.0e-4, "betas": [0.5, 0.9]},
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": 2.0e-4, "betas": [0.5, 0.9]},
    }
    gen = get_model_class(config["generator_type"])(**config["generator_params"])
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"]
    )
    criterion = build_criterion(config)
    og = build_optimizer_from_config(config, "generator")
    od = build_optimizer_from_config(config, "discriminator")
    t = 64
    batch = {
        "y": jnp.asarray(
            np.sin(np.arange(t * 16) / 9.0)[None, :, None] * 0.5, jnp.float32
        ).repeat(2, 0),
        "c": jnp.asarray(
            np.random.RandomState(0).randn(2, t, 10), jnp.float32
        ),
    }
    key = jax.random.key(0)
    gv = gen.init(key, batch["c"][:1])
    dv = dis.init({"params": key, "rwd": key}, batch["y"][:1])
    state = init_train_state(
        gv["params"], dv["params"], og, od,
        vars_g={k: v for k, v in gv.items() if k != "params"},
        vars_d={k: v for k, v in dv.items() if k != "params"},
    )
    step = build_train_step(
        config, gen, dis, criterion, og, od,
        train_g=True, train_d=True, donate=False,
    )
    mels, advs = [], []
    for i in range(41):
        state, m = step(state, batch, jax.random.key(i))
        mels.append(float(m["mel_loss"]))
        advs.append(float(m["adversarial_loss"]))
    # sane adversarial magnitudes from step 0 (no 1e10 explosion)
    assert max(advs) < 1e4, max(advs)
    # clear learning signal on the fixed batch
    assert mels[-1] < mels[0] * 0.85, (mels[0], mels[-1])
