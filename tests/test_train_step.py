"""Trainability smoke tests for the fused jitted GAN step.

Mirrors the reference's per-architecture one-G-step + one-D-step strategy
(/root/reference/test/test_parallel_wavegan.py:100-198 et al.) but through
this framework's single compiled train step, on tiny hyperparameters over
the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.optimizers import build_optimizer_from_config
from parallelwavegan_tpu.train.criterion import build_criterion
from parallelwavegan_tpu.train.state import init_train_state
from parallelwavegan_tpu.train.step import build_eval_step, build_train_step


def _run_two_steps(config, batch, init_args_fn, d_input_key="y"):
    gen = get_model_class(config["generator_type"])(**config["generator_params"])
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"]
    )
    criterion = build_criterion(config)
    opt_g = build_optimizer_from_config(config, "generator")
    opt_d = build_optimizer_from_config(config, "discriminator")
    key = jax.random.key(0)
    tb = {k: jnp.asarray(v) for k, v in batch.items()}
    g_vars = gen.init({"params": key, "noise": key}, *init_args_fn(tb))
    d_vars = dis.init({"params": key, "rwd": key}, tb[d_input_key])
    state = init_train_state(
        g_vars["params"], d_vars["params"], opt_g, opt_d,
        vars_g={k: v for k, v in g_vars.items() if k != "params"},
        vars_d={k: v for k, v in d_vars.items() if k != "params"},
    )
    step = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=True, train_d=True, donate=False,
    )
    state, metrics = step(state, tb, jax.random.key(1))
    state, metrics = step(state, tb, jax.random.key(2))
    assert int(state.steps) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    eval_step = build_eval_step(config, gen, dis, criterion)
    em = eval_step(state, tb, jax.random.key(3))
    assert np.isfinite(float(em["generator_loss"]))
    return metrics


BASE = {
    "sampling_rate": 8000,
    "fft_size": 256,
    "hop_size": 64,
    "win_length": None,
    "window": "hann",
    "num_mels": 10,
    "fmin": 0,
    "fmax": 4000,
    "use_stft_loss": True,
    "stft_loss_params": {
        "fft_sizes": [64, 128],
        "hop_sizes": [16, 32],
        "win_lengths": [32, 64],
    },
    "lambda_aux": 1.0,
    "lambda_adv": 1.0,
    "generator_optimizer_type": "RAdam",
    "generator_optimizer_params": {"lr": 1e-4},
    "discriminator_optimizer_type": "RAdam",
    "discriminator_optimizer_params": {"lr": 5e-5},
    "generator_grad_norm": 10,
    "discriminator_grad_norm": 1,
}


def test_pwg_train_step():
    rs = np.random.RandomState(0)
    config = dict(BASE)
    config.update(
        generator_type="ParallelWaveGANGenerator",
        generator_params={
            "layers": 4,
            "stacks": 2,
            "residual_channels": 8,
            "gate_channels": 16,
            "skip_channels": 8,
            "aux_channels": 10,
            "aux_context_window": 2,
            "upsample_params": {"upsample_scales": [4, 4, 4]},
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 3, "conv_channels": 8},
    )
    t_frames = 16
    batch = {
        "y": rs.randn(2, t_frames * 64, 1).astype(np.float32),
        "c": rs.randn(2, t_frames + 4, 10).astype(np.float32),
        "z": rs.randn(2, t_frames * 64, 1).astype(np.float32),
    }
    m = _run_two_steps(
        config, batch, lambda tb: (tb["z"], tb["c"])
    )
    assert "spectral_convergence_loss" in m


def test_pwg_train_step_without_prediction_update():
    """update_prediction_after_generator_update=false reuses G-phase fakes."""
    rs = np.random.RandomState(7)
    config = dict(BASE)
    config.update(
        generator_type="ParallelWaveGANGenerator",
        generator_params={
            "layers": 2,
            "stacks": 1,
            "residual_channels": 8,
            "gate_channels": 16,
            "skip_channels": 8,
            "aux_channels": 10,
            "aux_context_window": 0,
            "upsample_params": {"upsample_scales": [4, 4]},
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 3, "conv_channels": 8},
        update_prediction_after_generator_update=False,
    )
    t_frames = 8
    batch = {
        "y": rs.randn(2, t_frames * 16, 1).astype(np.float32),
        "c": rs.randn(2, t_frames, 10).astype(np.float32),
        "z": rs.randn(2, t_frames * 16, 1).astype(np.float32),
    }
    _run_two_steps(config, batch, lambda tb: (tb["z"], tb["c"]))


def test_multiband_melgan_train_step():
    rs = np.random.RandomState(1)
    config = dict(BASE)
    config.update(
        generator_type="MelGANGenerator",
        generator_params={
            "in_channels": 10,
            "out_channels": 4,
            "channels": 32,
            "upsample_scales": [4, 4],
            "stacks": 1,
        },
        discriminator_type="MelGANMultiScaleDiscriminator",
        discriminator_params={
            "scales": 2,
            "channels": 8,
            "downsample_scales": [2, 2],
            "max_downsample_channels": 32,
        },
        use_subband_stft_loss=True,
        subband_stft_loss_params={
            "fft_sizes": [32, 64],
            "hop_sizes": [8, 16],
            "win_lengths": [16, 32],
        },
    )
    t_frames = 16
    batch = {
        "y": rs.randn(2, t_frames * 64, 1).astype(np.float32),
        "c": rs.randn(2, t_frames, 10).astype(np.float32),
    }
    m = _run_two_steps(config, batch, lambda tb: (tb["c"],))
    assert "sub_spectral_convergence_loss" in m


def test_vqvae_train_step():
    rs = np.random.RandomState(2)
    config = dict(BASE)
    config.update(
        generator_type="VQVAE",
        generator_params={
            "in_channels": 1,
            "out_channels": 1,
            "num_embeds": 16,
            "embed_dim": 8,
            "encoder_conf": {
                "out_channels": 8,
                "downsample_scales": [4, 4],
                "channels": 8,
                "max_downsample_channels": 16,
            },
            "decoder_conf": {
                "in_channels": 8,
                "upsample_scales": [4, 4],
                "channels": 16,
                "stacks": 1,
            },
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 3, "conv_channels": 8},
        lambda_commit=0.25,
    )
    batch = {"y": rs.randn(2, 1024, 1).astype(np.float32)}
    m = _run_two_steps(config, batch, lambda tb: (tb["y"],))
    assert "quantization_loss" in m and "commitment_loss" in m


def test_discrete_duration_train_step():
    rs = np.random.RandomState(3)
    config = dict(BASE)
    config.update(
        generator_type="DiscreteSymbolDurationGenerator",
        generator_params={
            "in_channels": 16,
            "channels": 32,
            "num_embs": 20,
            "num_spk_embs": 4,
            "spk_emb_dim": 16,
            "duration_chans": 8,
            "upsample_scales": (4, 4),
            "upsample_kernel_sizes": (8, 8),
            "resblock_kernel_sizes": (3,),
            "resblock_dilations": ((1, 3),),
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 3, "conv_channels": 8},
        use_duration_loss=True,
    )
    n_tokens, frames = 6, 12
    ds = np.full((2, n_tokens), frames // n_tokens, np.int32)
    tokens = rs.randint(0, 20, (2, n_tokens, 1))
    spk = rs.randint(0, 4, (2, n_tokens, 1))  # ids must be < num_spk_embs
    batch = {
        "y": rs.randn(2, frames * 16, 1).astype(np.float32),
        "c": np.concatenate([tokens, spk], axis=-1).astype(np.int32),
        "ds": ds,
    }
    m = _run_two_steps(
        config, batch, lambda tb: (tb["c"], tb["ds"], frames)
    )
    assert "duration_loss" in m


def test_uhifigan_train_step():
    rs = np.random.RandomState(4)
    config = dict(BASE)
    config.update(
        generator_type="UHiFiGANGenerator",
        generator_params={
            "in_channels": 10,
            "channels": 8,
            "downsample_scales": (4, 4),
            "downsample_kernel_sizes": (8, 8),
            "upsample_scales": (4, 4),
            "upsample_kernel_sizes": (8, 8),
            "resblock_kernel_sizes": (3,),
            "resblock_dilations": ((1, 3),),
        },
        discriminator_type="ParallelWaveGANDiscriminator",
        discriminator_params={"layers": 3, "conv_channels": 8},
    )
    frames = 16
    batch = {
        "y": rs.randn(2, frames * 16, 1).astype(np.float32),
        "c": rs.randn(2, frames, 10).astype(np.float32),
        "excitation": rs.randn(2, frames * 16, 1).astype(np.float32),
        "f0": rs.rand(2, frames, 1).astype(np.float32) * 200,
    }
    _run_two_steps(config, batch, lambda tb: (tb["excitation"], tb["c"]))


def test_style_melgan_train_step():
    rs = np.random.RandomState(5)
    config = dict(BASE)
    config.update(
        generator_type="StyleMelGANGenerator",
        generator_params={
            "in_channels": 8,
            "aux_channels": 10,
            "channels": 8,
            "noise_upsample_scales": [4, 2],
            "upsample_scales": [4, 4, 1],
        },
        discriminator_type="StyleMelGANDiscriminator",
        discriminator_params={
            "repeats": 2,
            "window_sizes": [16, 32, 64, 128],
            "pqmf_params": [
                [1, None, None, None],
                [2, 62, 0.267, 9.0],
                [4, 62, 0.142, 9.0],
                [8, 62, 0.07949, 9.0],
            ],
            "discriminator_params": {
                "channels": 8,
                "downsample_scales": [2, 1],
                "kernel_sizes": [5, 3],
                "max_downsample_channels": 16,
            },
        },
        generator_adv_loss_params={"loss_type": "hinge"},
        discriminator_adv_loss_params={"loss_type": "hinge"},
    )
    frames = 8  # == prod(noise_upsample_scales)
    batch = {
        "y": rs.randn(2, frames * 16, 1).astype(np.float32),
        "c": rs.randn(2, frames, 10).astype(np.float32),
    }
    _run_two_steps(config, batch, lambda tb: (tb["c"],))
