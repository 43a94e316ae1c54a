"""Feature-matching loss over discriminator intermediate features.

Behavioral reference:
/root/reference/parallel_wavegan/losses/feat_match_loss.py:12-54
(L1 over per-layer features excl. final output by default, averaged by
layers and discriminators; groundtruth features are stop-gradiented).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class FeatureMatchLoss:
    average_by_layers: bool = True
    average_by_discriminators: bool = True
    include_final_outputs: bool = False

    def __call__(self, feats_hat, feats):
        total = 0.0
        n_d = 0
        for feats_hat_d, feats_d in zip(feats_hat, feats):
            if not self.include_final_outputs:
                feats_hat_d = feats_hat_d[:-1]
                feats_d = feats_d[:-1]
            d_loss = 0.0
            for f_hat, f in zip(feats_hat_d, feats_d):
                d_loss += jnp.mean(jnp.abs(f_hat - jax.lax.stop_gradient(f)))
            if self.average_by_layers:
                d_loss /= len(feats_d)
            total += d_loss
            n_d += 1
        if self.average_by_discriminators:
            total /= n_d
        return total
