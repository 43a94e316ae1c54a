"""Optimizer / LR-scheduler factories (optax).

Behavioral reference: the reference resolves torch classes by config string
(/root/reference/parallel_wavegan/bin/train.py:1454-1483) with `RAdam` as
its one custom optimizer (/root/reference/parallel_wavegan/optimizers/
radam.py:14). Here the same YAML vocabulary (type + torch-style params)
builds optax gradient transformations; torch LR schedulers become step ->
lr schedule functions (the reference calls scheduler.step() once per train
step, so all schedule units are train steps).
"""

from __future__ import annotations

from typing import Any, Callable

import optax


def build_lr_schedule(
    base_lr: float, scheduler_type: str | None, params: dict | None
) -> Callable[[Any], Any]:
    """Map a torch lr_scheduler config onto a step->lr function."""
    params = params or {}
    if scheduler_type in (None, "", "ConstantLR"):
        return lambda step: base_lr
    if scheduler_type == "StepLR":
        if "step_size" not in params:
            # torch.optim.lr_scheduler.StepLR requires step_size positionally;
            # silently training at constant LR on a config typo is worse.
            raise ValueError(
                "StepLR scheduler requires 'step_size' in scheduler_params "
                f"(got {params!r})"
            )
        step_size = params["step_size"]
        gamma = params.get("gamma", 0.1)

        def sched(step):
            return base_lr * gamma ** (step // step_size)

        return sched
    if scheduler_type == "MultiStepLR":
        milestones = sorted(params["milestones"])
        gamma = params.get("gamma", 0.1)
        boundaries = {int(m): gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if scheduler_type == "ExponentialLR":
        gamma = params["gamma"]

        def sched(step):
            return base_lr * gamma**step

        return sched
    if scheduler_type == "CosineAnnealingLR":
        t_max = params["T_max"]
        eta_min = params.get("eta_min", 0.0)
        return optax.cosine_decay_schedule(base_lr, t_max, alpha=eta_min / base_lr)
    if scheduler_type == "CosineAnnealingWarmRestarts":
        t_0 = float(params["T_0"])
        t_mult = float(params.get("T_mult", 1))
        eta_min = float(params.get("eta_min", 0.0))

        # closed form of torch's restart bookkeeping — restarts forever
        # (an enumerated-cycles sgdr_schedule clamps to eta_min once the
        # pre-built list runs out)
        def sched(step):
            import jax.numpy as jnp

            s = jnp.asarray(step, jnp.float32)
            if t_mult == 1.0:
                t_i = t_0
                t_cur = jnp.mod(s, t_0)
            else:
                n = jnp.floor(
                    jnp.log(s * (t_mult - 1.0) / t_0 + 1.0)
                    / jnp.log(t_mult)
                )
                t_i = t_0 * t_mult**n
                t_cur = s - t_0 * (t_mult**n - 1.0) / (t_mult - 1.0)
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * t_cur / t_i)
            )

        return sched
    if scheduler_type == "LinearLR":
        start = params.get("start_factor", 1.0 / 3.0)
        end = params.get("end_factor", 1.0)
        total = params.get("total_iters", 5)

        def sched(step):
            import jax.numpy as jnp

            frac = jnp.clip(step / total, 0.0, 1.0)
            return base_lr * (start + (end - start) * frac)

        return sched
    if scheduler_type == "PolynomialLR":
        total = params.get("total_iters", 5)
        power = params.get("power", 1.0)
        return optax.polynomial_schedule(
            init_value=base_lr, end_value=0.0, power=power,
            transition_steps=total,
        )
    if scheduler_type == "LambdaLR":
        raise ValueError(
            "LambdaLR takes a python callable and cannot be expressed in "
            "YAML; use MultiStepLR/ExponentialLR/CosineAnnealingLR instead"
        )
    raise ValueError(f"scheduler {scheduler_type!r} is not supported")


def build_optimizer(
    optimizer_type: str,
    optimizer_params: dict | None,
    scheduler_type: str | None = None,
    scheduler_params: dict | None = None,
    grad_norm: float = -1,
) -> optax.GradientTransformation:
    """Build an optax chain from torch-style optimizer/scheduler config.

    ``grad_norm > 0`` prepends global-norm clipping, mirroring
    ``torch.nn.utils.clip_grad_norm_`` before optimizer.step()
    (reference train.py:289-295).
    """
    p = dict(optimizer_params or {})
    lr = p.pop("lr", 1e-3)
    schedule = build_lr_schedule(lr, scheduler_type, scheduler_params)
    betas = p.pop("betas", (0.9, 0.999))
    # None = "not configured": each branch substitutes ITS torch default
    # (1e-8 adam-family, 1e-10 Adagrad, 1e-6 Adadelta) so an explicit
    # eps: 1e-8 is honored everywhere
    eps_cfg = p.pop("eps", None)
    eps = 1e-8 if eps_cfg is None else eps_cfg
    weight_decay = p.pop("weight_decay", 0.0)
    amsgrad = p.pop("amsgrad", False)
    if optimizer_type not in ("SGD", "RMSprop"):
        p.pop("momentum", None)

    if optimizer_type in ("Adam", "AdamW"):
        if amsgrad:
            opt = optax.amsgrad(schedule, b1=betas[0], b2=betas[1], eps=eps)
        elif optimizer_type == "AdamW":
            # torch AdamW = decoupled weight decay (default 0.01 in torch,
            # but we only apply what the config asked for).
            opt = optax.adamw(
                schedule,
                b1=betas[0],
                b2=betas[1],
                eps=eps,
                weight_decay=weight_decay,
            )
            weight_decay = 0.0
        else:
            opt = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif optimizer_type == "RAdam":
        opt = optax.radam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif optimizer_type == "SGD":
        momentum = (optimizer_params or {}).get("momentum", 0.0)
        opt = optax.sgd(schedule, momentum=momentum or None)
    elif optimizer_type == "NAdam":
        opt = optax.nadam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif optimizer_type == "NAdamW":
        opt = optax.nadamw(
            schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay,
        )
        weight_decay = 0.0
    elif optimizer_type == "Adamax":
        opt = optax.adamax(schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif optimizer_type == "RMSprop":
        alpha = p.pop("alpha", 0.99)
        momentum = p.pop("momentum", 0.0)
        centered = p.pop("centered", False)
        opt = optax.rmsprop(
            schedule, decay=alpha, eps=eps, centered=centered,
            momentum=momentum or None,
        )
    elif optimizer_type == "Adagrad":
        opt = optax.adagrad(
            schedule,
            initial_accumulator_value=p.pop("initial_accumulator_value", 0.0),
            eps=1e-10 if eps_cfg is None else eps_cfg,
        )
    elif optimizer_type == "Adadelta":
        opt = optax.adadelta(
            schedule, rho=p.pop("rho", 0.9),
            eps=1e-6 if eps_cfg is None else eps_cfg,
        )
    elif optimizer_type == "Lamb":
        opt = optax.lamb(
            schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay,
        )
        weight_decay = 0.0
    elif optimizer_type == "Lion":
        opt = optax.lion(
            schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay
        )
        weight_decay = 0.0
    else:
        raise ValueError(f"optimizer {optimizer_type!r} is not supported")

    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    if weight_decay and weight_decay > 0 and optimizer_type in (
        "Adam", "RAdam", "SGD", "NAdam", "Adamax", "RMSprop", "Adagrad",
        "Adadelta",
    ):
        # torch's Adam/RAdam/SGD weight_decay is L2-in-gradient: grad is
        # replaced by grad + wd*param BEFORE the moment updates — exactly
        # add_decayed_weights placed ahead of the optimizer in the chain
        # (decay happens after grad clipping, matching torch's order of
        # clip_grad_norm_ then optimizer.step()).
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(opt)
    return optax.chain(*chain) if len(chain) > 1 else opt


def build_optimizer_from_config(config: dict, prefix: str):
    """Build the '{prefix}' (generator/discriminator) optimizer from a YAML
    config (reference defaults: RAdam + StepLR, train.py:1454-1483).

    The reference requires ``{prefix}_scheduler_params`` (train.py:1485-1492
    indexes the config directly); when a config carries NO scheduler keys at
    all we use a constant LR rather than the torch TypeError, but an explicit
    StepLR without step_size raises (see build_lr_schedule).
    """
    sched_type = config.get(f"{prefix}_scheduler_type", "StepLR")
    sched_params = config.get(f"{prefix}_scheduler_params")
    if sched_params is None and f"{prefix}_scheduler_type" not in config:
        sched_type = None
    return build_optimizer(
        config.get(f"{prefix}_optimizer_type", "RAdam"),
        config.get(f"{prefix}_optimizer_params", {}),
        sched_type,
        sched_params or {},
        config.get(f"{prefix}_grad_norm", -1),
    )
