"""Training state pytree.

Replaces the reference's dicts of torch modules/optimizers/schedulers
(/root/reference/parallel_wavegan/bin/train.py:114-187) with one
flax.struct dataclass that jits, donates, shards, and serializes as a
single pytree. LR schedules are step-indexed functions baked into the
optax chain, so no separate scheduler state exists.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    steps: jnp.ndarray  # int32 scalar, counted like the reference's steps
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    vars_d: Any  # non-param collections of D (spectral-norm power vectors)
    vars_g: Any  # non-param collections of G (rarely used)


def init_train_state(params_g, params_d, opt_g_tx, opt_d_tx,
                     vars_g=None, vars_d=None) -> TrainState:
    return TrainState(
        steps=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_g=opt_g_tx.init(params_g),
        opt_d=opt_d_tx.init(params_d),
        vars_d=vars_d if vars_d is not None else {},
        vars_g=vars_g if vars_g is not None else {},
    )
