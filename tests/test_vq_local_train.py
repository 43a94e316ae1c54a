"""VQ-VAE local/global conditioning through the train CLI.

Regression guard for the full conditioned-VQ wiring: preprocess-style
"local" features (continuous log-F0 + V/UV, reference preprocess.py:
136-185) must flow dataset -> collater -> template init -> train step.
The collater flags in bin/train.py were once not passed through
(use_local_condition/use_global_condition), which emptied every batch —
an e2e-only failure no unit test caught.
"""

import os
import subprocess
import sys

import numpy as np
import yaml

from parallelwavegan_tpu.utils.io import write_hdf5

CONFIG = {
    "sampling_rate": 8000,
    "hop_size": 64,
    "use_local_condition": True,
    "use_global_condition": True,
    "format": "hdf5",
    "generator_type": "VQVAE",
    "generator_params": {
        "in_channels": 1,
        "out_channels": 1,
        "num_embeds": 16,
        "embed_dim": 8,
        "num_local_embeds": 2,
        "local_embed_dim": 4,
        "num_global_embeds": 4,
        "global_embed_dim": 4,
        "encoder_type": "MelGANDiscriminator",
        "decoder_type": "MelGANGenerator",
        "encoder_conf": {
            "out_channels": 8,
            "downsample_scales": [4, 4, 2, 2],
            "channels": 4,
            "max_downsample_channels": 16,
        },
        "decoder_conf": {
            "in_channels": 16,  # embed 8 + local 4 + global 4
            "upsample_scales": [4, 4, 2, 2],
            "channels": 64,  # MelGAN asserts channels >= prod(scales)
            "stacks": 1,
        },
    },
    "discriminator_type": "MelGANMultiScaleDiscriminator",
    "discriminator_params": {
        "in_channels": 1,
        "out_channels": 1,
        "scales": 1,
        "downsample_pooling": "AvgPool1d",
        "downsample_pooling_params": {
            "kernel_size": 4, "stride": 2, "padding": 1,
            "count_include_pad": False,
        },
        "kernel_sizes": [5, 3],
        "channels": 4,
        "max_downsample_channels": 8,
        "downsample_scales": [4],
        "use_weight_norm": True,
    },
    "stft_loss_params": {
        "fft_sizes": [64],
        "hop_sizes": [16],
        "win_lengths": [32],
        "window": "hann_window",
    },
    "use_feat_match_loss": False,
    "lambda_commit": 0.25,
    "lambda_adv": 4.0,
    "batch_size": 2,
    "batch_max_steps": 1024,
    "num_workers": 0,
    "remove_short_samples": False,
    "allow_cache": False,
    "generator_optimizer_params": {"lr": 1e-4},
    "generator_scheduler_params": {"step_size": 100, "gamma": 0.5},
    "generator_grad_norm": 10,
    "discriminator_optimizer_params": {"lr": 5e-5},
    "discriminator_scheduler_params": {"step_size": 100, "gamma": 0.5},
    "discriminator_grad_norm": 1,
    "discriminator_train_start_steps": 0,
    "train_max_steps": 2,
    "save_interval_steps": 2,
    "eval_interval_steps": 100,
    "log_interval_steps": 1,
    "num_save_intermediate_results": 1,
    "distributed": False,
}


def _write_vq_dump(dirname, n, seed):
    os.makedirs(dirname, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        n_frames = 40 + 4 * i
        wave = rng.randn(n_frames * 64).astype(np.float32) * 0.1
        lf0 = np.log(100 + 50 * rng.rand(n_frames)).astype(np.float32)
        vuv = (rng.rand(n_frames) > 0.3).astype(np.float32)
        local = np.stack([lf0, vuv], axis=-1)
        path = os.path.join(dirname, f"utt{seed}_{i}.h5")
        write_hdf5(path, "wave", wave)
        write_hdf5(path, "local", local)
        write_hdf5(path, "global", np.asarray(i % 4))


def test_vq_local_global_train_cli(tmp_path):
    train_dir, dev_dir = tmp_path / "train", tmp_path / "dev"
    _write_vq_dump(str(train_dir), 4, 0)
    _write_vq_dump(str(dev_dir), 2, 1)
    conf = tmp_path / "conf.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(CONFIG, f)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable, "-m", "parallelwavegan_tpu.bin.train",
            "--config", str(conf),
            "--train-dumpdir", str(train_dir),
            "--dev-dumpdir", str(dev_dir),
            "--outdir", str(tmp_path / "exp"),
            "--verbose", "1",
        ],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    log = out.stdout + out.stderr
    assert out.returncode == 0, log[-4000:]
    assert (tmp_path / "exp" / "checkpoint-2steps.pkl").exists(), log[-2000:]
