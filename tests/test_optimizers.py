"""Optimizer/scheduler factory coverage.

The reference resolves ANY torch.optim / lr_scheduler class by config
string (/root/reference/parallel_wavegan/bin/train.py:1454-1483); this
pins the optax-backed vocabulary: every mapped name builds, steps, and
produces finite torch-comparable updates.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.optimizers import build_lr_schedule, build_optimizer

OPTIMIZERS = [
    "Adam", "AdamW", "RAdam", "SGD", "NAdam", "NAdamW", "Adamax",
    "RMSprop", "Adagrad", "Adadelta", "Lamb", "Lion",
]


@pytest.mark.parametrize("opt_type", OPTIMIZERS)
def test_optimizer_builds_and_steps(opt_type):
    tx = build_optimizer(
        opt_type, {"lr": 1e-3, "weight_decay": 0.01}, None, None, 1.0
    )
    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.full((4, 4), 0.1)}
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert float(np.abs(np.asarray(updates["w"])).max()) > 0


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError, match="not supported"):
        build_optimizer("FancyOpt", {"lr": 1e-3})


SCHEDULES = [
    ("StepLR", {"step_size": 10, "gamma": 0.5},
     [(0, 1e-3), (10, 5e-4), (20, 2.5e-4)]),
    ("MultiStepLR", {"milestones": [10, 20], "gamma": 0.5},
     [(0, 1e-3), (15, 5e-4), (25, 2.5e-4)]),
    ("ExponentialLR", {"gamma": 0.9}, [(0, 1e-3), (1, 9e-4)]),
    ("CosineAnnealingLR", {"T_max": 100}, [(0, 1e-3), (100, 0.0)]),
    ("CosineAnnealingWarmRestarts", {"T_0": 100},
     [(0, 1e-3), (100, 1e-3)]),
    ("LinearLR", {"start_factor": 0.5, "total_iters": 10},
     [(0, 5e-4), (10, 1e-3), (20, 1e-3)]),
    ("PolynomialLR", {"total_iters": 100, "power": 1.0},
     [(0, 1e-3), (50, 5e-4), (100, 0.0)]),
]


@pytest.mark.parametrize("name,params,expect", SCHEDULES,
                         ids=[s[0] for s in SCHEDULES])
def test_scheduler_values(name, params, expect):
    sched = build_lr_schedule(1e-3, name, params)
    for step, lr in expect:
        np.testing.assert_allclose(float(sched(step)), lr, atol=1e-9,
                                   err_msg=f"{name}@{step}")


def test_steplr_without_step_size_raises():
    with pytest.raises(ValueError, match="step_size"):
        build_lr_schedule(1e-3, "StepLR", {})


def test_lambdalr_rejected_with_guidance():
    with pytest.raises(ValueError, match="YAML"):
        build_lr_schedule(1e-3, "LambdaLR", {})
