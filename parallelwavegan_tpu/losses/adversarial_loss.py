"""Adversarial losses over (possibly nested) discriminator outputs.

Behavioral reference:
/root/reference/parallel_wavegan/losses/adversarial_loss.py:12-123
(mse/hinge criteria, [-1]-of-feature-list nesting rule, optional averaging
over discriminators).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def _final_outputs(outputs):
    """Normalize D outputs to a flat list of final-layer tensors."""
    if not isinstance(outputs, (tuple, list)):
        return [outputs]
    finals = []
    for o in outputs:
        finals.append(o[-1] if isinstance(o, (tuple, list)) else o)
    return finals


@dataclass(frozen=True)
class GeneratorAdversarialLoss:
    average_by_discriminators: bool = True
    loss_type: str = "mse"

    def __post_init__(self):
        assert self.loss_type in ("mse", "hinge"), f"{self.loss_type} unsupported"

    def __call__(self, outputs):
        finals = _final_outputs(outputs)
        loss = 0.0
        for x in finals:
            if self.loss_type == "mse":
                loss += jnp.mean((x - 1.0) ** 2)
            else:
                loss += -jnp.mean(x)
        if self.average_by_discriminators:
            loss /= len(finals)
        return loss


@dataclass(frozen=True)
class DiscriminatorAdversarialLoss:
    average_by_discriminators: bool = True
    loss_type: str = "mse"

    def __post_init__(self):
        assert self.loss_type in ("mse", "hinge"), f"{self.loss_type} unsupported"

    def __call__(self, outputs_hat, outputs):
        fakes = _final_outputs(outputs_hat)
        reals = _final_outputs(outputs)
        real_loss = 0.0
        fake_loss = 0.0
        for x_hat, x in zip(fakes, reals):
            if self.loss_type == "mse":
                real_loss += jnp.mean((x - 1.0) ** 2)
                fake_loss += jnp.mean(x_hat**2)
            else:
                real_loss += -jnp.mean(jnp.minimum(x - 1.0, 0.0))
                fake_loss += -jnp.mean(jnp.minimum(-x_hat - 1.0, 0.0))
        if self.average_by_discriminators:
            real_loss /= len(reals)
            fake_loss /= len(fakes)
        return real_loss, fake_loss
