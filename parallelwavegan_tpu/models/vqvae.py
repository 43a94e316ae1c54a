"""VQ-VAE wave2wave codec (flax.linen, NTC layout).

Behavioral reference: /root/reference/parallel_wavegan/models/vqvae.py
(:16-147): MelGANDiscriminator reused as the encoder (last feature map is
the latent), VQCodebook straight-through quantization, MelGANGenerator
decoder, with optional local (1x1-conv-embedded) and global (id-embedding)
conditioning concatenated before decoding; encode()/decode() split serves
the decode CLI (bin/decode.py:340-361).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import Conv1d
from parallelwavegan_tpu.layers.vq import VQCodebook
from parallelwavegan_tpu.models.melgan import MelGANDiscriminator, MelGANGenerator

Array = jax.Array

_MODEL_CLASSES = {
    "MelGANDiscriminator": MelGANDiscriminator,
    "MelGANGenerator": MelGANGenerator,
}


class VQVAE(nn.Module):
    """VQ-VAE: audio (B, T, in) -> (recon (B, T, out), z_e, z_q)."""

    in_channels: int = 1
    out_channels: int = 1
    num_embeds: int = 512
    embed_dim: int = 256
    num_local_embeds: int | None = None
    local_embed_dim: int | None = None
    num_global_embeds: int | None = None
    global_embed_dim: int | None = None
    encoder_type: str = "MelGANDiscriminator"
    decoder_type: str = "MelGANGenerator"
    encoder_conf: Any = None
    decoder_conf: Any = None
    use_weight_norm: bool = True

    def setup(self):
        enc_conf = dict(
            self.encoder_conf
            or {
                "out_channels": 256,
                "downsample_scales": [4, 4, 2, 2],
                "max_downsample_channels": 1024,
            }
        )
        dec_conf = dict(
            self.decoder_conf
            or {
                "in_channels": 256,
                "upsample_scales": [4, 4, 2, 2],
                "channels": 512,
                "stacks": 3,
            }
        )
        enc_conf["in_channels"] = self.in_channels
        dec_conf["out_channels"] = self.out_channels
        if self.decoder_type != "MelGANGenerator":
            raise NotImplementedError(f"{self.decoder_type} is not supported yet.")
        norm_kw = {}
        if self.encoder_type == "MelGANDiscriminator":
            norm_kw["norm"] = "weight" if self.use_weight_norm else None
        self.encoder = _MODEL_CLASSES[self.encoder_type](**enc_conf, **norm_kw)
        self.codebook = VQCodebook(
            num_embeds=self.num_embeds, embed_dim=self.embed_dim
        )
        dec_conf["use_weight_norm"] = self.use_weight_norm
        self.decoder = _MODEL_CLASSES[self.decoder_type](**dec_conf)
        if self.num_local_embeds is not None and self.local_embed_dim is not None:
            self.local_embed = Conv1d(
                features=self.local_embed_dim,
                kernel_size=1,
                norm="weight" if self.use_weight_norm else None,
                name="local_embed",
            )
        else:
            self.local_embed = None
        if self.num_global_embeds is not None:
            self.global_embed = nn.Embed(
                self.num_global_embeds, self.global_embed_dim, name="global_embed"
            )
        else:
            self.global_embed = None

    def _encode_latent(self, x: Array) -> Array:
        z_e = self.encoder(x)
        return z_e[-1] if isinstance(z_e, (list, tuple)) else z_e

    def _condition(self, z: Array, l: Array | None, g: Array | None) -> Array:
        if l is not None:
            if self.local_embed is not None:
                l = self.local_embed(l)
            z = jnp.concatenate([z, l], axis=-1)
        if g is not None:
            ge = self.global_embed(g)  # (B, D)
            ge = jnp.broadcast_to(
                ge[:, None, :], (z.shape[0], z.shape[1], ge.shape[-1])
            )
            z = jnp.concatenate([z, ge], axis=-1)
        return z

    def __call__(self, x: Array, l: Array | None = None,
                 g: Array | None = None):
        """-> (x_bar, z_e, z_q); both latents (B, T//prod(scales), embed_dim)."""
        z_e = self._encode_latent(x)
        z_q_st, z_q = self.codebook.straight_through(z_e)
        z = self._condition(z_q_st, l, g)
        x_bar = self.decoder(z)
        return x_bar, z_e, z_q

    def encode(self, x: Array) -> Array:
        """Audio -> codebook indices (B, T // prod(downsample_scales))."""
        return self.codebook(self._encode_latent(x))

    def decode(self, indices: Array, l: Array | None = None,
               g: Array | None = None) -> Array:
        """Codebook indices -> reconstructed audio."""
        z_q = self.codebook.embedding[indices]
        z = self._condition(z_q, l, g)
        return self.decoder(z)

    requires_noise_input = False
    requires_aux_input = False
