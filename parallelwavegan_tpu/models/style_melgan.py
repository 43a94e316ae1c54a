"""StyleMelGAN model family (flax.linen, NTC layout).

Behavioral reference: /root/reference/parallel_wavegan/models/style_melgan.py
  * Generator: :18-238 (noise (B, 1, in_ch) upsampled by transposed-conv
    stack, 9 TADEResBlocks injecting mel, kernel-9 output conv + tanh;
    N(0, 0.02) init; pad-then-trim inference :227-238)
  * Discriminator: :243-360 (random-window discriminator: ``repeats``
    passes over 4 PQMF-split windows, each through a MelGANDiscriminator;
    random window start per call :330-336)
  * DiscreteSymbolStyleMelGANGenerator: :364-` (id + speaker embeddings
    in front of the same trunk)

TPU design: the random window starts come from an explicit flax RNG stream
(``rngs={'rwd': key}``) and windows are ``lax.dynamic_slice`` so the whole
discriminator jits with static window shapes.
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
from parallelwavegan_tpu.layers.tade import TADEResBlock
from parallelwavegan_tpu.models.melgan import MelGANDiscriminator
from parallelwavegan_tpu.ops.pqmf import PQMF

Array = jax.Array


class _StyleMelGANTrunk(nn.Module):
    """Noise upsample + TADE blocks + output conv (shared by both G's)."""

    in_channels: int
    aux_channels: int
    channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    bias: bool
    noise_upsample_scales: Sequence[int]
    noise_upsample_activation: str
    noise_upsample_activation_params: Any
    upsample_scales: Sequence[int]
    upsample_mode: str
    gated_function: str
    use_weight_norm: bool
    # fused decode path: run the long TADE blocks through the packed
    # Pallas kernels (ops/pallas_kernels/tade_decode.py); same param tree,
    # inference-only, no-op off TPU (interpret mode in tests)
    use_pallas_tade: bool = False
    pallas_tade_tile: int = 1024
    pallas_tade_min_t: int = 4096
    # training path: custom_vjp fused TADE blocks (tade_train.py) — fused
    # forward AND fused reverse kernels, grads ≤2e-4 vs the XLA path
    use_pallas_tade_train: bool = False
    pallas_tade_train_tile: int = 512
    pallas_tade_train_min_t: int = 1024

    @nn.compact
    def __call__(self, c: Array, z: Array) -> Array:
        norm = "weight" if self.use_weight_norm else None
        kinit = normal_init(0.02)
        act = get_activation(
            self.noise_upsample_activation,
            self.noise_upsample_activation_params or {"negative_slope": 0.2},
        )
        x = z
        for i, scale in enumerate(self.noise_upsample_scales):
            x = ConvTranspose1d(
                features=self.channels,
                kernel_size=scale * 2,
                stride=scale,
                padding=scale // 2 + scale % 2,
                output_padding=scale % 2,
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name=f"noise_upsample_{i}",
            )(x)
            x = act(x)

        block_mods = [
            TADEResBlock(
                in_channels=self.channels,
                aux_channels=(self.aux_channels if i == 0 else self.channels),
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                bias=self.bias,
                upsample_factor=scale,
                upsample_mode=self.upsample_mode,
                gated_function=self.gated_function,
                norm=norm,
                name=f"blocks_{i}",
            )
            for i, scale in enumerate(self.upsample_scales)
        ]
        from parallelwavegan_tpu.ops.pallas_kernels import pallas_backend_ok

        use_fused = (
            (self.use_pallas_tade or self.use_pallas_tade_train)
            and self.channels == 64
            and pallas_backend_ok()
        )
        if use_fused:
            if self.use_pallas_tade_train:
                from parallelwavegan_tpu.ops.pallas_kernels.tade_train import (
                    fused_tade_blocks_train as fused_fn,
                )

                min_t, tile = (self.pallas_tade_train_min_t,
                               self.pallas_tade_train_tile)
            else:
                from parallelwavegan_tpu.ops.pallas_kernels.tade_decode import (
                    fused_tade_blocks as fused_fn,
                )

                min_t, tile = self.pallas_tade_min_t, self.pallas_tade_tile

            blocks = []
            for i, mod in enumerate(block_mods):
                ach = self.aux_channels if i == 0 else self.channels
                dx = jnp.zeros(x.shape[:2] + (self.channels,), x.dtype)
                dc = jnp.zeros(x.shape[:2] + (ach,), x.dtype)
                blocks.append(mod(dx, dc, collect_weights=True))
            x, c = fused_fn(
                x, c, blocks, gated_function=self.gated_function,
                min_fused_t=min_t, t_tile=tile,
            )
        else:
            for mod in block_mods:
                x, c = mod(x, c)

        x = Conv1d(
            features=self.out_channels,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            use_bias=self.bias,
            norm=norm,
            kernel_init=kinit,
            name="output_conv",
        )(x)
        return jnp.tanh(x)


class StyleMelGANGenerator(nn.Module):
    """StyleMelGAN generator: (mel (B, T', aux), z (B, Tz, in)) -> wave.

    In training Tz = 1 and the noise upsample stretches it by
    prod(noise_upsample_scales) = T'; in inference Tz = ceil(T' / factor)
    and the mel is replication-padded to the noise length (see
    ``pad_aux_for_inference``).
    """

    in_channels: int = 128
    aux_channels: int = 80
    channels: int = 64
    out_channels: int = 1
    kernel_size: int = 9
    dilation: int = 2
    bias: bool = True
    noise_upsample_scales: Sequence[int] = (11, 2, 2, 2)
    noise_upsample_activation: str = "LeakyReLU"
    noise_upsample_activation_params: Any = None
    upsample_scales: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 1)
    upsample_mode: str = "nearest"
    gated_function: str = "softmax"
    use_weight_norm: bool = True
    use_pallas_tade: bool = False
    pallas_tade_tile: int = 1024
    pallas_tade_min_t: int = 4096
    use_pallas_tade_train: bool = False
    pallas_tade_train_tile: int = 512
    pallas_tade_train_min_t: int = 1024

    @nn.compact
    def __call__(self, c: Array, z: Array | None = None) -> Array:
        if z is None:
            z = jax.random.normal(
                self.make_rng("noise"), (c.shape[0], 1, self.in_channels), c.dtype
            )
        return _StyleMelGANTrunk(
            in_channels=self.in_channels,
            aux_channels=self.aux_channels,
            channels=self.channels,
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            bias=self.bias,
            noise_upsample_scales=self.noise_upsample_scales,
            noise_upsample_activation=self.noise_upsample_activation,
            noise_upsample_activation_params=self.noise_upsample_activation_params,
            upsample_scales=self.upsample_scales,
            upsample_mode=self.upsample_mode,
            gated_function=self.gated_function,
            use_weight_norm=self.use_weight_norm,
            use_pallas_tade=self.use_pallas_tade,
            pallas_tade_tile=self.pallas_tade_tile,
            pallas_tade_min_t=self.pallas_tade_min_t,
            use_pallas_tade_train=self.use_pallas_tade_train,
            pallas_tade_train_tile=self.pallas_tade_train_tile,
            pallas_tade_train_min_t=self.pallas_tade_train_min_t,
            name="trunk",
        )(c, z)

    @property
    def noise_upsample_factor(self) -> int:
        f = 1
        for s in self.noise_upsample_scales:
            f *= s
        return f

    @property
    def upsample_factor(self) -> int:
        f = 1
        for s in self.upsample_scales:
            f *= s
        return f

    requires_noise_input = False  # noise drawn internally like the reference
    requires_aux_input = True


class DiscreteSymbolStyleMelGANGenerator(nn.Module):
    """Discrete-unit StyleMelGAN (ref style_melgan.py:364-556).

    Tokens (B, T, 2) — channel 0 unit ids, channel 1 speaker id — are
    embedded (+speaker add/concat) and feed the StyleMelGAN trunk.
    """

    in_channels: int = 128
    aux_channels: int = 128
    channels: int = 64
    out_channels: int = 1
    num_embs: int = 100
    num_spk_embs: int = 128
    spk_emb_dim: int = 128
    concat_spk_emb: bool = False
    kernel_size: int = 9
    dilation: int = 2
    bias: bool = True
    noise_upsample_scales: Sequence[int] = (11, 2, 2, 2)
    noise_upsample_activation: str = "LeakyReLU"
    noise_upsample_activation_params: Any = None
    upsample_scales: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 1)
    upsample_mode: str = "nearest"
    gated_function: str = "softmax"
    use_weight_norm: bool = True
    use_pallas_tade: bool = False
    pallas_tade_tile: int = 1024
    pallas_tade_min_t: int = 4096
    use_pallas_tade_train: bool = False
    pallas_tade_train_tile: int = 512
    pallas_tade_train_min_t: int = 1024

    @nn.compact
    def __call__(self, c: Array, z: Array | None = None) -> Array:
        assert c.shape[-1] == 2
        tokens = nn.Embed(self.num_embs, self.aux_channels, name="emb")(
            c[..., 0].astype(jnp.int32)
        )
        spk = nn.Embed(self.num_spk_embs, self.spk_emb_dim, name="spk_emb")(
            c[:, 0, 1].astype(jnp.int32)
        )
        if not self.concat_spk_emb:
            assert self.aux_channels == self.spk_emb_dim
            cond = tokens + spk[:, None, :]
            aux_channels = self.aux_channels
        else:
            spk_b = jnp.broadcast_to(
                spk[:, None, :], tokens.shape[:2] + (self.spk_emb_dim,)
            )
            cond = jnp.concatenate([tokens, spk_b], axis=-1)
            aux_channels = self.aux_channels + self.spk_emb_dim
        if z is None:
            z = jax.random.normal(
                self.make_rng("noise"), (cond.shape[0], 1, self.in_channels),
                cond.dtype,
            )
        return _StyleMelGANTrunk(
            in_channels=self.in_channels,
            aux_channels=aux_channels,
            channels=self.channels,
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            bias=self.bias,
            noise_upsample_scales=self.noise_upsample_scales,
            noise_upsample_activation=self.noise_upsample_activation,
            noise_upsample_activation_params=self.noise_upsample_activation_params,
            upsample_scales=self.upsample_scales,
            upsample_mode=self.upsample_mode,
            gated_function=self.gated_function,
            use_weight_norm=self.use_weight_norm,
            use_pallas_tade=self.use_pallas_tade,
            pallas_tade_tile=self.pallas_tade_tile,
            pallas_tade_min_t=self.pallas_tade_min_t,
            use_pallas_tade_train=self.use_pallas_tade_train,
            pallas_tade_train_tile=self.pallas_tade_train_tile,
            pallas_tade_train_min_t=self.pallas_tade_train_min_t,
            name="trunk",
        )(cond, z)

    @property
    def noise_upsample_factor(self) -> int:
        f = 1
        for s in self.noise_upsample_scales:
            f *= s
        return f

    @property
    def upsample_factor(self) -> int:
        f = 1
        for s in self.upsample_scales:
            f *= s
        return f

    requires_noise_input = False
    requires_aux_input = True


class StyleMelGANDiscriminator(nn.Module):
    """Random-window discriminator over PQMF sub-band splits.

    Needs an ``rwd`` RNG stream for the random window starts:
    ``D.apply(params, x, rngs={'rwd': key})``. Alternatively pass
    ``starts`` — an int array of ``repeats * len(window_sizes)`` window
    offsets (each in ``[0, T - window_size)``) — for deterministic windows
    (used by the cross-trainer A/B to pin the reference's
    ``np.random.randint`` draws, ref style_melgan.py:330-336; also handy
    for debugging).
    """

    repeats: int = 2
    window_sizes: Sequence[int] = (512, 1024, 2048, 4096)
    pqmf_params: Sequence[Sequence] = (
        (1, None, None, None),
        (2, 62, 0.26700, 9.0),
        (4, 62, 0.14200, 9.0),
        (8, 62, 0.07949, 9.0),
    )
    discriminator_params: Any = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array, starts: Array | None = None) -> list[list[Array]]:
        assert len(self.window_sizes) == len(self.pqmf_params)
        sizes = [ws // p[0] for ws, p in zip(self.window_sizes, self.pqmf_params)]
        assert all(s == sizes[0] for s in sizes)
        d_defaults = {
            "out_channels": 1,
            "kernel_sizes": [5, 3],
            "channels": 16,
            "max_downsample_channels": 512,
            "bias": True,
            "downsample_scales": [4, 4, 4, 1],
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.2},
            "pad": "ReflectionPad1d",
            "pad_params": {},
        }
        d_defaults.update(self.discriminator_params or {})
        norm = "weight" if self.use_weight_norm else None

        discriminators = []
        for idx, pqmf_param in enumerate(self.pqmf_params):
            d_params = dict(d_defaults)
            d_params["in_channels"] = pqmf_param[0]
            d_params["norm"] = norm
            discriminators.append(
                MelGANDiscriminator(**d_params, name=f"discriminators_{idx}")
            )

        outs = []
        wi = 0
        for _ in range(self.repeats):  # params shared across repeats
            for ws, pqmf_param, disc in zip(
                self.window_sizes, self.pqmf_params, discriminators
            ):
                if starts is not None:
                    start = starts[wi]
                    wi += 1
                else:
                    start = jax.random.randint(
                        self.make_rng("rwd"), (), 0, x.shape[1] - ws
                    )
                x_ = jax.lax.dynamic_slice_in_dim(x, start, ws, axis=1)
                if pqmf_param[0] > 1:
                    x_ = PQMF(*pqmf_param).analysis(x_)
                outs.append(disc(x_))
        return outs
