"""Checkpoint-conversion CLI (`parallel-wavegan-convert`).

Converts a reference torch checkpoint (.pkl written by
/root/reference/parallel_wavegan/bin/train.py:114-146) into this
framework's native msgpack format: generator + discriminator parameters
map losslessly (weight-norm (g, v) preserved); optimizer moments restart
fresh (torch Adam state is keyed by parameter order and its moments are
not layout-portable; fine-tuning from converted weights uses --pretrain
semantics anyway).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from flax import serialization

from parallelwavegan_tpu.convert.torch_checkpoint import (
    convert_state_dict,
    load_torch_checkpoint,
)


def main():
    parser = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint to native format."
    )
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str,
                        help="config.yml (defaults to checkpoint dir's)")
    parser.add_argument("--outpath", type=str, required=True)
    parser.add_argument("--generator-only", default=False, action="store_true")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config_path = args.config or os.path.join(
        os.path.dirname(args.checkpoint), "config.yml"
    )
    with open(config_path) as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)

    ckpt = load_torch_checkpoint(args.checkpoint)
    params_g, vars_g = convert_state_dict(
        config.get("generator_type", "ParallelWaveGANGenerator"),
        config["generator_params"],
        ckpt["model"]["generator"],
    )
    payload = {
        "steps": np.asarray(int(ckpt.get("steps", 0)), np.int32),
        "epochs": np.asarray(int(ckpt.get("epochs", 0))),
        "model": {"generator": params_g, "discriminator": {}},
        "vars": {"generator": vars_g, "discriminator": {}},
        "optimizer": {"generator": {}, "discriminator": {}},
    }
    if not args.generator_only and "discriminator" in ckpt.get("model", {}):
        params_d, vars_d = convert_state_dict(
            config["discriminator_type"],
            config["discriminator_params"],
            ckpt["model"]["discriminator"],
        )
        payload["model"]["discriminator"] = params_d
        payload["vars"]["discriminator"] = vars_d

    os.makedirs(os.path.dirname(args.outpath) or ".", exist_ok=True)
    with open(args.outpath, "wb") as f:
        f.write(serialization.to_bytes(payload))
    logging.info("Converted %s -> %s.", args.checkpoint, args.outpath)


if __name__ == "__main__":
    main()
