"""Single-file checkpointing of the training state.

Contract mirror of the reference's torch pickle layout
(/root/reference/parallel_wavegan/bin/train.py:114-187): a nested tree
{model: {generator, discriminator}, optimizer: {...}, steps, epochs} with
``load_only_params`` separating --pretrain from --resume. Serialization is
flax msgpack (pickle-free, framework-native); decode-side loading of
generator-only weights matches utils.load_model's behavior
(/root/reference/parallel_wavegan/utils/utils.py:294-360).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, epochs: int = 0, extra: dict | None = None):
    """Serialize the TrainState (+ host counters) to ``path``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "steps": np.asarray(state.steps),
        "epochs": np.asarray(epochs),
        "model": {
            "generator": _to_numpy_tree(state.params_g),
            "discriminator": _to_numpy_tree(state.params_d),
        },
        "vars": {
            "generator": _to_numpy_tree(state.vars_g),
            "discriminator": _to_numpy_tree(state.vars_d),
        },
        "optimizer": {
            "generator": _to_numpy_tree(state.opt_g),
            "discriminator": _to_numpy_tree(state.opt_d),
        },
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)


def load_checkpoint(path: str, state, load_only_params: bool = False):
    """Restore a TrainState from ``path``.

    Args:
        state: a template TrainState (for tree structure/shapes).
        load_only_params: --pretrain semantics: restore model params only,
            keep fresh optimizer state and step counter (train.py:148-187).

    Returns:
        (new_state, epochs)
    """
    with open(path, "rb") as f:
        raw = f.read()
    template = {
        "steps": np.asarray(state.steps),
        "epochs": np.asarray(0),
        "model": {
            "generator": _to_numpy_tree(state.params_g),
            "discriminator": _to_numpy_tree(state.params_d),
        },
        "vars": {
            "generator": _to_numpy_tree(state.vars_g),
            "discriminator": _to_numpy_tree(state.vars_d),
        },
        "optimizer": {
            "generator": _to_numpy_tree(state.opt_g),
            "discriminator": _to_numpy_tree(state.opt_d),
        },
    }
    payload = serialization.from_bytes(template, raw)
    new_state = state.replace(
        params_g=payload["model"]["generator"],
        params_d=payload["model"]["discriminator"],
        vars_g=payload["vars"]["generator"],
        vars_d=payload["vars"]["discriminator"],
    )
    if not load_only_params:
        new_state = new_state.replace(
            steps=np.asarray(payload["steps"]),
            opt_g=payload["optimizer"]["generator"],
            opt_d=payload["optimizer"]["discriminator"],
        )
        return new_state, int(payload["epochs"])
    return new_state, 0


def load_generator_params(path: str):
    """Read only model.generator (+vars) from a checkpoint, structure-free.

    Used by the decode CLI / load_model, where no optimizer template
    exists. Returns (params_g, vars_g, steps).
    """
    with open(path, "rb") as f:
        raw = f.read()
    tree = serialization.msgpack_restore(raw)
    return (
        tree["model"]["generator"],
        tree.get("vars", {}).get("generator", {}),
        int(np.asarray(tree["steps"])),
    )
