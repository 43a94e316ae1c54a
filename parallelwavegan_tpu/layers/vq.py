"""Vector-quantization codebook with straight-through gradients.

Behavioral reference:
/root/reference/parallel_wavegan/layers/vector_quantize_codebook.py:17-72 and
/root/reference/parallel_wavegan/functions/vector_quantizer.py:16-114.

TPU design: the nearest-neighbor search is a single (B*T, D) x (D, N)
matmul on the MXU plus an argmin; the reference's custom autograd Function
pair collapses into two ``stop_gradient`` compositions:
  * z_q for the decoder: gradient passes straight through to z_e and the
    lookup uses a detached codebook (matches VQCodebook.straight_through's
    ``self.embedding.weight.detach()``).
  * z_q_bar for the quantization loss: an ordinary differentiable gather so
    the codebook receives the commitment gradient.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def nearest_codebook_indices(z_e: Array, codebook: Array) -> Array:
    """Nearest-neighbor codebook indices.

    Args:
        z_e: (..., embed_dim) continuous latents.
        codebook: (num_embeds, embed_dim).

    Returns:
        int32 indices (...,).
    """
    flat = z_e.reshape(-1, z_e.shape[-1])
    # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2; ||z||^2 constant in argmin
    dots = flat @ codebook.T
    dist = jnp.sum(codebook**2, axis=1)[None, :] - 2.0 * dots
    return jnp.argmin(dist, axis=-1).reshape(z_e.shape[:-1]).astype(jnp.int32)


class VQCodebook(nn.Module):
    """Codebook of ``num_embeds`` x ``embed_dim`` with U(-1/N, 1/N) init."""

    num_embeds: int
    embed_dim: int

    def setup(self):
        bound = 1.0 / self.num_embeds
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-bound, maxval=bound
            ),
            (self.num_embeds, self.embed_dim),
        )

    def __call__(self, z_e: Array) -> Array:
        """Codebook indices for (B, T, embed_dim) latents -> (B, T) int32."""
        return nearest_codebook_indices(
            jax.lax.stop_gradient(z_e), jax.lax.stop_gradient(self.embedding)
        )

    def straight_through(self, z_e: Array) -> tuple[Array, Array]:
        """Straight-through lookup.

        Returns:
            z_q: decoder input; d(z_q)/d(z_e) = identity, no codebook grad.
            z_q_bar: same values but differentiable w.r.t. the codebook
                (for the VQ/commitment loss).
        """
        indices = nearest_codebook_indices(
            jax.lax.stop_gradient(z_e), jax.lax.stop_gradient(self.embedding)
        )
        lookup = jax.lax.stop_gradient(self.embedding)[indices]
        z_q = z_e + jax.lax.stop_gradient(lookup - z_e)
        z_q_bar = self.embedding[indices]
        return z_q, z_q_bar
