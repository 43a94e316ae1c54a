"""Discrete-symbol (HuBERT-unit) vocoder generators (flax.linen, NTC).

Behavioral reference: /root/reference/parallel_wavegan/models/hifigan.py
  * DiscreteSymbolHiFiGANGenerator :867-1091 — token embedding + optional
    speaker-id embedding (add or concat) in front of a HiFi-GAN trunk
    whose upsamples use padding (K - scale) // 2 with no output padding
  * DiscreteSymbolDurationGenerator :1094-1289 — adds a FastSpeech
    DurationPredictor + LengthRegulator; train path forward(c, ds),
    inference path synthesis(c) predicting durations
and /root/reference/parallel_wavegan/models/style_melgan.py:364-` for
DiscreteSymbolStyleMelGANGenerator.

TPU design: the length regulator is the static-shape gather formulation
(layers/duration.py) — training passes the known teacher-forced output
length; host-side inference computes the dynamic length from the predicted
durations and re-pads to a bucket.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import (
    Conv1d,
    ConvTranspose1d,
    get_activation,
    normal_init,
)
from parallelwavegan_tpu.layers.duration import DurationPredictor, length_regulator
from parallelwavegan_tpu.layers.residual_block import HiFiGANResidualBlock

Array = jax.Array


class _DiscreteEmbedding(nn.Module):
    """Token (+ optional speaker) embedding front-end (ref :915-930, :1000-1020).

    Input c is int (B, T, 1) or (B, T, 2) with the speaker id in channel 1.
    """

    num_embs: int
    in_channels: int
    num_spk_embs: int
    spk_emb_dim: int
    concat_spk_emb: bool

    @nn.compact
    def __call__(self, c: Array) -> Array:
        emb = nn.Embed(self.num_embs, self.in_channels, name="emb")
        if self.num_spk_embs > 0:
            assert c.shape[-1] == 2
            tokens = emb(c[..., 0].astype(jnp.int32))  # (B, T, C)
            spk = nn.Embed(self.num_spk_embs, self.spk_emb_dim, name="spk_emb")(
                c[:, 0, 1].astype(jnp.int32)
            )  # (B, D)
            if not self.concat_spk_emb:
                tokens = tokens + spk[:, None, :]
            else:
                spk_b = jnp.broadcast_to(
                    spk[:, None, :], tokens.shape[:2] + (self.spk_emb_dim,)
                )
                tokens = jnp.concatenate([tokens, spk_b], axis=-1)
        else:
            assert c.shape[-1] == 1
            tokens = emb(c[..., 0].astype(jnp.int32))
        return tokens


class _DiscreteHiFiGANTrunk(nn.Module):
    """input conv -> per-scale (act, deconv, MRF-average) -> output conv."""

    out_channels: int
    channels: int
    kernel_size: int
    upsample_scales: Sequence[int]
    upsample_kernel_sizes: Sequence[int]
    resblock_kernel_sizes: Sequence[int]
    resblock_dilations: Sequence[Sequence[int]]
    use_additional_convs: bool
    bias: bool
    nonlinear_activation: str
    nonlinear_activation_params: Any
    use_weight_norm: bool
    use_pallas_tail: bool = False  # fused decode-tail kernel (see hifigan.py)
    pallas_tail_tile: int = 1024

    @nn.compact
    def __call__(self, c: Array) -> Array:
        norm = "weight" if self.use_weight_norm else None
        kinit = normal_init(0.01)
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        num_blocks = len(self.resblock_kernel_sizes)
        n_up = len(self.upsample_scales)
        tail_from = None
        from parallelwavegan_tpu.ops.pallas_kernels import pallas_backend_ok

        if (
            self.use_pallas_tail
            and self.use_additional_convs
            and self.bias
            and self.out_channels == 1
            and self.nonlinear_activation == "LeakyReLU"
            and n_up >= 2
            and all(s == 2 for s in self.upsample_scales[-2:])
            # the kernel's shift table assumes seq_out = seq*s, which the
            # trunk's (K-s)//2 deconv padding only gives for K == 2s
            # (hifigan.py asserts the same; e.g. K=5,s=2 -> 2T+1 samples)
            and all(self.upsample_kernel_sizes[i] == 2 * self.upsample_scales[i]
                    for i in (n_up - 2, n_up - 1))
            and pallas_backend_ok()
        ):
            c_tail = self.channels // (2 ** (n_up - 2))
            if c_tail <= 128 and (c_tail & (c_tail - 1)) == 0:
                tail_from = n_up - 2
        tail_pre = tail_from - 1 if tail_from not in (None, 0) else None

        c = Conv1d(
            features=self.channels,
            kernel_size=self.kernel_size,
            padding="same",
            norm=norm,
            kernel_init=kinit,
            name="input_conv",
        )(c)
        for i, scale in enumerate(self.upsample_scales):
            k = self.upsample_kernel_sizes[i]
            ch = self.channels // (2 ** (i + 1))
            if tail_from is not None and i == (
                tail_pre if tail_pre is not None else tail_from
            ):
                if tail_pre is None:
                    return self._fused_tail(c, tail_from, norm, kinit,
                                            num_blocks)
                c = act(c)
                c = ConvTranspose1d(
                    features=ch,
                    kernel_size=k,
                    stride=scale,
                    padding=(k - scale) // 2,
                    output_padding=0,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"upsamples_{i}",
                )(c)
                return self._fused_tail(c, tail_from, norm, kinit, num_blocks)
            c = act(c)
            # reference uses padding=(K - scale)//2, output_padding=0 here
            c = ConvTranspose1d(
                features=ch,
                kernel_size=k,
                stride=scale,
                padding=(k - scale) // 2,
                output_padding=0,
                norm=norm,
                kernel_init=kinit,
                name=f"upsamples_{i}",
            )(c)
            cs = 0.0
            for j in range(num_blocks):
                cs += HiFiGANResidualBlock(
                    kernel_size=self.resblock_kernel_sizes[j],
                    channels=ch,
                    dilations=self.resblock_dilations[j],
                    use_bias=self.bias,
                    use_additional_convs=self.use_additional_convs,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=self.nonlinear_activation_params
                    or {"negative_slope": 0.1},
                    norm=norm,
                    name=f"blocks_{i * num_blocks + j}",
                )(c)
            c = cs / num_blocks
        c = get_activation("LeakyReLU", {"negative_slope": 0.01})(c)
        c = Conv1d(
            features=self.out_channels,
            kernel_size=self.kernel_size,
            padding="same",
            norm=norm,
            kernel_init=kinit,
            name="output_conv",
        )(c)
        return jnp.tanh(c)

    def _fused_tail(self, c, tail_from: int, norm, kinit, num_blocks: int):
        """Fused last-two-stages + output conv; trunk deconv padding is
        (K-scale)//2 with output_padding 0 (vs HiFiGANGenerator's
        scale//2+scale%2 — identical where the gates allow K == 2s). The
        preceding stage's MRF folds in at the entry rate when the kernel
        is entered post-deconv (tail_pre path)."""
        from parallelwavegan_tpu.models.hifigan import (
            collect_and_run_fused_tail,
        )

        return collect_and_run_fused_tail(
            self, c, tail_from, norm, kinit, num_blocks,
            pre=tail_from >= 1,
            deconv_pad=lambda k, s: ((k - s) // 2, 0),
        )


class DiscreteSymbolHiFiGANGenerator(nn.Module):
    """Discrete tokens (B, T, 1|2) -> wave (B, T * prod(scales), out)."""

    in_channels: int = 512
    out_channels: int = 1
    channels: int = 512
    num_embs: int = 100
    num_spk_embs: int = 128
    spk_emb_dim: int = 128
    concat_spk_emb: bool = False
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_additional_convs: bool = True
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    use_weight_norm: bool = True
    use_pallas_tail: bool = False  # fused decode-tail kernel
    pallas_tail_tile: int = 1024

    @property
    def _vocab_size(self) -> int:
        return self.num_embs

    def setup(self):
        self.embedding = _DiscreteEmbedding(
            num_embs=self._vocab_size,
            in_channels=self.in_channels,
            num_spk_embs=self.num_spk_embs,
            spk_emb_dim=self.spk_emb_dim,
            concat_spk_emb=self.concat_spk_emb,
        )
        self.trunk = _DiscreteHiFiGANTrunk(
            out_channels=self.out_channels,
            channels=self.channels,
            kernel_size=self.kernel_size,
            upsample_scales=self.upsample_scales,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilations=self.resblock_dilations,
            use_additional_convs=self.use_additional_convs,
            bias=self.bias,
            nonlinear_activation=self.nonlinear_activation,
            nonlinear_activation_params=self.nonlinear_activation_params,
            use_weight_norm=self.use_weight_norm,
            use_pallas_tail=self.use_pallas_tail,
            pallas_tail_tile=self.pallas_tail_tile,
        )

    def __call__(self, c: Array) -> Array:
        return self.trunk(self.embedding(c))

    requires_noise_input = False
    requires_aux_input = True


class DiscreteSymbolDurationGenerator(DiscreteSymbolHiFiGANGenerator):
    """Duration-predicting discrete vocoder (ref :1094-1289).

    Train path: ``__call__(c, ds, out_length)`` expands tokens by the
    teacher durations to ``out_length`` frames and returns (wave,
    log-domain predicted durations). Inference: ``predict_durations`` +
    host-side expansion, or ``synthesis`` with a static output length.
    """

    duration_layers: int = 2
    duration_chans: int = 384
    duration_kernel_size: int = 3
    duration_offset: float = 1.0
    duration_dropout_rate: float = 0.5

    @property
    def _vocab_size(self) -> int:
        return self.num_embs + 1  # padding symbol (ref :1155)

    def _emb_channels(self) -> int:
        if self.num_spk_embs > 0 and self.concat_spk_emb:
            return self.in_channels + self.spk_emb_dim
        return self.in_channels

    def setup(self):
        super().setup()
        self.duration_predictor = DurationPredictor(
            idim=self._emb_channels(),
            n_layers=self.duration_layers,
            n_chans=self.duration_chans,
            kernel_size=self.duration_kernel_size,
            dropout_rate=self.duration_dropout_rate,
            offset=self.duration_offset,
        )

    def __call__(self, c: Array, ds: Array, out_length: int | None = None,
                 *, deterministic: bool = True):
        emb = self.embedding(c)
        ds_out = self.duration_predictor(emb, deterministic=deterministic)
        if out_length is None:
            out_length = int(ds.shape[1]) * 2  # fallback; callers pass exact
        expanded = length_regulator(emb, ds, out_length)
        wave = self.trunk(expanded)
        return wave, ds_out

    def predict_durations(self, c: Array) -> Array:
        """Inference-path integer durations (B, T)."""
        return self.duration_predictor.inference(self.embedding(c))

    def decode_expanded(self, expanded: Array) -> Array:
        """Trunk over already-expanded embeddings (host-side regulator)."""
        return self.trunk(expanded)

    def embed_tokens(self, c: Array) -> Array:
        return self.embedding(c)
