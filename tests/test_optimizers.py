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


def test_rmsprop_momentum_is_honored(monkeypatch):
    """momentum in RMSprop params must reach optax.rmsprop (it was being
    pre-popped by the generic non-SGD momentum strip)."""
    import optax

    seen = {}
    real = optax.rmsprop

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(optax, "rmsprop", spy)
    build_optimizer("RMSprop", {"lr": 1e-3, "momentum": 0.9}, None, None, -1)
    assert seen.get("momentum") == 0.9


def test_adagrad_explicit_eps_honored(monkeypatch):
    """eps: 1e-8 set explicitly must NOT be remapped to the torch default."""
    import optax

    seen = {}
    real = optax.adagrad

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(optax, "adagrad", spy)
    build_optimizer("Adagrad", {"lr": 1e-2, "eps": 1e-8}, None, None, -1)
    assert seen.get("eps") == 1e-8
    seen.clear()
    build_optimizer("Adagrad", {"lr": 1e-2}, None, None, -1)
    assert seen.get("eps") == 1e-10  # torch default when unconfigured


def test_cosine_warm_restarts_restarts_forever():
    """torch restarts indefinitely; the schedule must not clamp to eta_min
    after a fixed number of enumerated cycles."""
    base, t0 = 1.0, 100
    sched = build_lr_schedule(base, "CosineAnnealingWarmRestarts", {"T_0": t0})
    # exact restart points, arbitrarily far out
    for k in (0, 1, 63, 64, 1000):
        np.testing.assert_allclose(float(sched(k * t0)), base, rtol=1e-6)
    # mid-cycle = halfway between base and eta_min (0.0)
    np.testing.assert_allclose(float(sched(500 * t0 + t0 // 2)), 0.5,
                               rtol=1e-5)


def test_cosine_warm_restarts_t_mult_matches_torch_bookkeeping():
    """T_mult=2: cycle i spans T_0*2^i steps; compare the closed form
    against explicit torch-style T_cur/T_i bookkeeping."""
    base, t0, mult, eta = 0.1, 50, 2, 0.001
    sched = build_lr_schedule(
        base, "CosineAnnealingWarmRestarts",
        {"T_0": t0, "T_mult": mult, "eta_min": eta},
    )
    t_cur, t_i = 0, t0
    for step in range(0, 2000):
        expect = eta + (base - eta) * 0.5 * (1 + np.cos(np.pi * t_cur / t_i))
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-4,
                                   err_msg=f"step {step}")
        t_cur += 1
        if t_cur >= t_i:
            t_cur, t_i = 0, t_i * mult
