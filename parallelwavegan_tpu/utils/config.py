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


def dump_config(config: dict, outdir: str, name: str = "config.yml") -> str:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, name)
    with open(path, "w") as f:
        yaml.dump(config, f, Dumper=yaml.Dumper)
    return path
