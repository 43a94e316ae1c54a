"""YAML config loading with argparse merge + re-dump.

Behavioral reference: /root/reference/parallel_wavegan/bin/train.py:1098-1104
(yaml.load + vars(args) merge, config.yml dumped into the experiment dir
and later consumed by decode/load_model).
"""

from __future__ import annotations

import os

import yaml


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.load(f, Loader=yaml.SafeLoader)


def merge_args(config: dict, args, exclude: tuple = ("config",)) -> dict:
    """Overlay argparse namespace vars onto the config (args win)."""
    merged = dict(config)
    for k, v in vars(args).items():
        if k in exclude:
            continue
        merged[k] = v
    return merged


def validate_local_condition(config: dict) -> None:
    """Fail fast when local conditioning can't align with the latent grid.

    A local-conditioned VQ-VAE concatenates hop_size-grid features onto
    the encoder latent (stride = prod(encoder downsample_scales)); a
    mismatch only surfaces as an opaque concat shape error deep inside
    jit, so check it at config load instead.
    """
    if not config.get("use_local_condition", False):
        return
    if "VQVAE" not in config.get("generator_type", ""):
        return
    gp = config.get("generator_params", {})
    enc = gp.get("encoder_conf") or {}
    scales = enc.get("downsample_scales", [4, 4, 2, 2])
    stride = 1
    for s in scales:
        stride *= int(s)
    hop = config.get("hop_size")
    if hop != stride:
        raise ValueError(
            f"use_local_condition requires hop_size == "
            f"prod(encoder downsample_scales): hop_size={hop}, "
            f"encoder stride={stride} ({list(scales)}) — the local "
            f"features and the VQ latent would sit on different grids"
        )


def dump_config(config: dict, outdir: str, name: str = "config.yml") -> str:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, name)
    with open(path, "w") as f:
        yaml.dump(config, f, Dumper=yaml.Dumper)
    return path
