"""HiFi-GAN model family (flax.linen, NTC layout).

Behavioral reference: /root/reference/parallel_wavegan/models/hifigan.py
  * Generator (MRF): :23-267
  * Period discriminator: :270-401 (1D->2D reshape by period, reflect pad)
  * Multi-period D: :404-453
  * Scale discriminator: :456-702 (grouped convs, weight-or-spectral norm)
  * Multi-scale D (+AvgPool between scales): :705-777
  * Multi-scale + multi-period D: :780-864

TPU design notes: audio is (B, T, 1) and mel is (B, T', C) so every conv
contraction runs on the MXU without layout shuffles; upsampling is an
input-dilated conv (one fused XLA op); the MRF "sum of blocks / N" stays as
XLA-fused elementwise math.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from parallelwavegan_tpu.layers.convs import (
    CausalConv1d,
    CausalConvTranspose1d,
    Conv1d,
    Conv2dP,
    ConvTranspose1d,
    get_activation,
    normal_init,
)
from parallelwavegan_tpu.layers.residual_block import HiFiGANResidualBlock

Array = jax.Array


def collect_and_run_fused_tail(mdl, c, tail_from: int, norm, kinit,
                               num_blocks: int, *, pre: bool, deconv_pad):
    """Shared fused-decode-tail collector for HiFiGAN-shaped generators.

    Walks the same flax submodules (by name) as the standard layer-by-layer
    path so the param tree is identical, gathers their effective weights
    with ``collect_weights=True`` / ``return_params=True``, and hands them
    to the fused Pallas tail kernel. ``deconv_pad(k, s)`` returns the
    trunk's ``(padding, output_padding)`` convention — HiFiGANGenerator
    uses ``(s//2 + s%2, s%2)``, the discrete trunk ``((k-s)//2, 0)``; the
    fused gates require ``k == 2s`` where both coincide. With ``pre``,
    ``c`` is the post-deconv input of stage ``tail_from - 1`` and that
    stage's MRF folds into the kernel at the entry rate.

    Called from inside the generator's ``@nn.compact __call__`` — flax's
    dynamic module context attaches the submodules created here to the
    calling generator.
    """
    from parallelwavegan_tpu.ops.pallas_kernels.hifigan_tail import (
        fused_hifigan_tail,
    )

    n_up = len(mdl.upsample_scales)
    act_params = mdl.nonlinear_activation_params or {"negative_slope": 0.1}
    slope = act_params.get("negative_slope", 0.1)

    def collect_blocks(j, chj, dummy):
        return [
            HiFiGANResidualBlock(
                kernel_size=mdl.resblock_kernel_sizes[jj],
                channels=chj,
                dilations=mdl.resblock_dilations[jj],
                use_bias=mdl.bias,
                use_additional_convs=mdl.use_additional_convs,
                nonlinear_activation=mdl.nonlinear_activation,
                nonlinear_activation_params=act_params,
                norm=norm,
                name=f"blocks_{j * num_blocks + jj}",
            )(dummy, collect_weights=True)
            for jj in range(num_blocks)
        ]

    pre_blocks = None
    if pre:
        j = tail_from - 1
        chp = mdl.channels // (2 ** (j + 1))
        pre_blocks = collect_blocks(
            j, chp, jnp.zeros(c.shape[:2] + (chp,), c.dtype)
        )
    stages = []
    dummy_in = c
    for j in range(tail_from, n_up):
        scale = mdl.upsample_scales[j]
        k = mdl.upsample_kernel_sizes[j]
        chj = mdl.channels // (2 ** (j + 1))
        pad, outpad = deconv_pad(k, scale)
        dw, db = ConvTranspose1d(
            features=chj,
            kernel_size=k,
            stride=scale,
            padding=pad,
            output_padding=outpad,
            use_bias=mdl.bias,
            norm=norm,
            kernel_init=kinit,
            name=f"upsamples_{j}",
        )(dummy_in, return_params=True)
        dummy = jnp.zeros(c.shape[:2] + (chj,), c.dtype)
        stages.append({
            "deconv_w": dw, "deconv_b": db, "stride": scale,
            "padding": pad, "blocks": collect_blocks(j, chj, dummy),
        })
        dummy_in = dummy
    fw, fb = Conv1d(
        features=mdl.out_channels,
        kernel_size=mdl.kernel_size,
        padding="same",
        use_bias=mdl.bias,
        norm=norm,
        kernel_init=kinit,
        name="output_conv",
    )(dummy_in, return_params=True)
    return fused_hifigan_tail(
        c, stages, fw, fb, slope=slope, t_tile=mdl.pallas_tail_tile,
        pre_blocks=pre_blocks,
    )


def _norm_of(use_weight_norm: bool, use_spectral_norm: bool = False) -> str | None:
    if use_weight_norm and use_spectral_norm:
        raise ValueError("Either use use_weight_norm or use_spectral_norm.")
    if use_weight_norm:
        return "weight"
    if use_spectral_norm:
        return "spectral"
    return None


class HiFiGANGenerator(nn.Module):
    """HiFi-GAN generator: mel (B, T, in_channels) -> wave (B, T*prod(scales), out)."""

    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_additional_convs: bool = True
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    use_causal_conv: bool = False
    use_weight_norm: bool = True
    use_pallas_mrf: bool = False  # fused MRF inference kernel per scale
    pallas_mrf_tile: int = 1536
    pallas_mrf_max_channels: int = 64  # packed kernel wins for C<=64 stages
    # fuse the last two stride-2 stages + output conv into ONE packed
    # kernel (ops/pallas_kernels/hifigan_tail.py); measured ~2x over the
    # isolated XLA schedule on v5e
    use_pallas_tail: bool = False
    pallas_tail_tile: int = 1024

    def setup(self):
        assert self.kernel_size % 2 == 1, "Kernel size must be odd number."
        assert len(self.upsample_scales) == len(self.upsample_kernel_sizes)
        assert len(self.resblock_dilations) == len(self.resblock_kernel_sizes)

    @nn.compact
    def __call__(self, c: Array) -> Array:
        norm = "weight" if self.use_weight_norm else None
        # without weight norm the reference's N(0, 0.01) reset is effective
        kinit = None if self.use_weight_norm else normal_init(0.01)
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        num_blocks = len(self.resblock_kernel_sizes)

        if self.use_causal_conv:
            c = CausalConv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name="input_conv",
            )(c)
        else:
            c = Conv1d(
                features=self.channels,
                kernel_size=self.kernel_size,
                padding="same",
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name="input_conv",
            )(c)

        n_up = len(self.upsample_scales)
        tail_from = None
        from parallelwavegan_tpu.ops.pallas_kernels import pallas_backend_ok

        if (
            self.use_pallas_tail
            and not self.use_causal_conv
            and self.use_additional_convs
            and self.bias
            and self.out_channels == 1
            and self.nonlinear_activation == "LeakyReLU"
            and n_up >= 2
            and all(s == 2 for s in self.upsample_scales[-2:])
            and pallas_backend_ok()
        ):
            c_tail = self.channels // (2 ** (n_up - 2))
            # packed lanes are conserved only when the tail entry channel
            # count is a power of two <= 128 (C halves as T doubles)
            if c_tail <= 128 and (c_tail & (c_tail - 1)) == 0:
                tail_from = n_up - 2
        # when there is a preceding stage, its MRF runs at the tail entry
        # rate and folds into the same kernel (after that stage's deconv)
        tail_pre = tail_from - 1 if tail_from not in (None, 0) else None

        for i, (scale, ksize) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            assert ksize == 2 * scale
            ch = self.channels // (2 ** (i + 1))
            if tail_from is not None and i == (
                tail_pre if tail_pre is not None else tail_from
            ):
                if tail_pre is None:
                    return self._fused_tail(
                        c, tail_from, norm, kinit, num_blocks, pre=False
                    )
                # run this stage's act+deconv, fold its MRF into the kernel
                c = act(c)
                c = ConvTranspose1d(
                    features=ch,
                    kernel_size=ksize,
                    stride=scale,
                    padding=scale // 2 + scale % 2,
                    output_padding=scale % 2,
                    use_bias=self.bias,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"upsamples_{i}",
                )(c)
                return self._fused_tail(
                    c, tail_from, norm, kinit, num_blocks, pre=True
                )
            c = act(c)
            if self.use_causal_conv:
                c = CausalConvTranspose1d(
                    features=ch,
                    kernel_size=ksize,
                    stride=scale,
                    use_bias=self.bias,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"upsamples_{i}",
                )(c)
            else:
                c = ConvTranspose1d(
                    features=ch,
                    kernel_size=ksize,
                    stride=scale,
                    padding=scale // 2 + scale % 2,
                    output_padding=scale % 2,
                    use_bias=self.bias,
                    norm=norm,
                    kernel_init=kinit,
                    name=f"upsamples_{i}",
                )(c)
            blocks = [
                HiFiGANResidualBlock(
                    kernel_size=self.resblock_kernel_sizes[j],
                    channels=ch,
                    dilations=self.resblock_dilations[j],
                    use_bias=self.bias,
                    use_additional_convs=self.use_additional_convs,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=self.nonlinear_activation_params
                    or {"negative_slope": 0.1},
                    use_causal_conv=self.use_causal_conv,
                    norm=norm,
                    name=f"blocks_{i * num_blocks + j}",
                )
                for j in range(num_blocks)
            ]
            if (
                self.use_pallas_mrf
                and not self.use_causal_conv
                and self.use_additional_convs
                and self.bias
                and ch <= self.pallas_mrf_max_channels
                and pallas_backend_ok()
            ):
                from parallelwavegan_tpu.ops.pallas_kernels.hifigan_mrf import (
                    fused_hifigan_mrf,
                    fused_hifigan_mrf_packed,
                )

                slope = (
                    self.nonlinear_activation_params or {"negative_slope": 0.1}
                ).get("negative_slope", 0.1)
                weights = [blk(c, collect_weights=True) for blk in blocks]
                if ch <= 64:
                    # space-to-depth packing runs the MXU at full lane width
                    c = fused_hifigan_mrf_packed(c, weights, slope=slope)
                else:
                    c = fused_hifigan_mrf(
                        c, weights, slope=slope, t_tile=self.pallas_mrf_tile
                    )
            else:
                cs = jnp.zeros_like(c)
                for blk in blocks:
                    cs += blk(c)
                c = cs / num_blocks

        # official impl uses default LeakyReLU slope (0.01) on the output conv
        c = get_activation("LeakyReLU", {"negative_slope": 0.01})(c)
        if self.use_causal_conv:
            c = CausalConv1d(
                features=self.out_channels,
                kernel_size=self.kernel_size,
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name="output_conv",
            )(c)
        else:
            c = Conv1d(
                features=self.out_channels,
                kernel_size=self.kernel_size,
                padding="same",
                use_bias=self.bias,
                norm=norm,
                kernel_init=kinit,
                name="output_conv",
            )(c)
        return jnp.tanh(c)

    def _fused_tail(self, c, tail_from: int, norm, kinit, num_blocks: int,
                    pre: bool = False):
        """Collect effective weights for the last two stages + output conv
        (same param tree as the standard path) and run the fused tail
        kernel (ops/pallas_kernels/hifigan_tail.py). With ``pre``, c is
        the post-deconv input of stage tail_from-1 and that stage's MRF
        runs inside the kernel at the entry rate."""
        return collect_and_run_fused_tail(
            self, c, tail_from, norm, kinit, num_blocks, pre=pre,
            deconv_pad=lambda k, s: (s // 2 + s % 2, s % 2),
        )

    # --- metadata used by trainer/decoder wiring -------------------------
    @property
    def upsample_factor(self) -> int:
        f = 1
        for s in self.upsample_scales:
            f *= s
        return f

    requires_noise_input = False
    requires_aux_input = True


class HiFiGANPeriodDiscriminator(nn.Module):
    """Period discriminator: (B, T, 1) -> list of per-layer features."""

    in_channels: int = 1
    out_channels: int = 1
    period: int = 3
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 32
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    use_weight_norm: bool = True
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        norm = _norm_of(self.use_weight_norm, self.use_spectral_norm)
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t += n_pad
        # (B, T, C) -> (B, T/P, P, C): conv over T/P, periods as width
        x = x.reshape(b, t // self.period, self.period, c)

        outs = []
        out_chs = self.channels
        k0 = self.kernel_sizes[0]
        for i, scale in enumerate(self.downsample_scales):
            x = Conv2dP(
                features=out_chs,
                kernel_size=(k0, 1),
                strides=(scale, 1),
                padding=(((k0 - 1) // 2, (k0 - 1) // 2), (0, 0)),
                use_bias=self.bias,
                norm=norm,
                name=f"convs_{i}",
            )(x)
            x = act(x)
            outs.append(x)
            out_chs = min(out_chs * 4, self.max_downsample_channels)
        k1 = self.kernel_sizes[1]
        x = Conv2dP(
            features=self.out_channels,
            kernel_size=(k1 - 1, 1),
            strides=(1, 1),
            padding=(((k1 - 1) // 2, (k1 - 1) // 2), (0, 0)),
            use_bias=self.bias,
            norm=norm,
            name="output_conv",
        )(x)
        outs.append(x.reshape(b, -1))
        return outs


_DEFAULT_PERIOD_D_PARAMS = {
    "in_channels": 1,
    "out_channels": 1,
    "kernel_sizes": [5, 3],
    "channels": 32,
    "downsample_scales": [3, 3, 3, 3, 1],
    "max_downsample_channels": 1024,
    "bias": True,
    "nonlinear_activation": "LeakyReLU",
    "nonlinear_activation_params": {"negative_slope": 0.1},
    "use_weight_norm": True,
    "use_spectral_norm": False,
}


class HiFiGANMultiPeriodDiscriminator(nn.Module):
    """Multi-period D: list over periods of per-layer feature lists."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    discriminator_params: Any = None

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        params = dict(_DEFAULT_PERIOD_D_PARAMS)
        params.update(self.discriminator_params or {})
        outs = []
        for i, period in enumerate(self.periods):
            p = dict(params)
            p["period"] = period
            outs.append(
                HiFiGANPeriodDiscriminator(**p, name=f"discriminators_{i}")(x)
            )
        return outs


class HiFiGANScaleDiscriminator(nn.Module):
    """Scale discriminator: grouped conv stack, per-layer features."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    bias: bool = True
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: Any = None
    use_weight_norm: bool = True
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        assert len(self.kernel_sizes) == 4
        for ks in self.kernel_sizes:
            assert ks % 2 == 1
        norm = _norm_of(self.use_weight_norm, self.use_spectral_norm)
        act = get_activation(
            self.nonlinear_activation,
            self.nonlinear_activation_params or {"negative_slope": 0.1},
        )
        outs = []
        li = 0

        x = Conv1d(
            features=self.channels,
            kernel_size=self.kernel_sizes[0],
            padding="same",
            use_bias=self.bias,
            norm=norm,
            name=f"layers_{li}",
        )(x)
        x = act(x)
        outs.append(x)
        li += 1

        in_chs = self.channels
        out_chs = self.channels
        groups = 4
        for scale in self.downsample_scales:
            x = Conv1d(
                features=out_chs,
                kernel_size=self.kernel_sizes[1],
                stride=scale,
                padding=(self.kernel_sizes[1] - 1) // 2,
                groups=groups,
                use_bias=self.bias,
                norm=norm,
                name=f"layers_{li}",
            )(x)
            x = act(x)
            outs.append(x)
            li += 1
            in_chs = out_chs
            out_chs = min(in_chs * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        x = Conv1d(
            features=out_chs,
            kernel_size=self.kernel_sizes[2],
            padding="same",
            use_bias=self.bias,
            norm=norm,
            name=f"layers_{li}",
        )(x)
        x = act(x)
        outs.append(x)
        li += 1
        x = Conv1d(
            features=self.out_channels,
            kernel_size=self.kernel_sizes[3],
            padding="same",
            use_bias=self.bias,
            norm=norm,
            name=f"layers_{li}",
        )(x)
        outs.append(x)
        return outs


def avg_pool1d(x: Array, kernel_size: int, stride: int, padding: int) -> Array:
    """torch AvgPool1d (count_include_pad=True) over (B, T, C)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    return summed / kernel_size


_DEFAULT_SCALE_D_PARAMS = {
    "in_channels": 1,
    "out_channels": 1,
    "kernel_sizes": [15, 41, 5, 3],
    "channels": 128,
    "max_downsample_channels": 1024,
    "max_groups": 16,
    "bias": True,
    "downsample_scales": [2, 2, 4, 4, 1],
    "nonlinear_activation": "LeakyReLU",
    "nonlinear_activation_params": {"negative_slope": 0.1},
}


class HiFiGANMultiScaleDiscriminator(nn.Module):
    """Multi-scale D with AvgPool1d(4, 2, 2) between scales."""

    scales: int = 3
    downsample_pooling: str = "AvgPool1d"
    downsample_pooling_params: Any = None
    discriminator_params: Any = None
    follow_official_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        pool_params = {"kernel_size": 4, "stride": 2, "padding": 2}
        pool_params.update(self.downsample_pooling_params or {})
        params = dict(_DEFAULT_SCALE_D_PARAMS)
        params.update(self.discriminator_params or {})
        outs = []
        for i in range(self.scales):
            p = dict(params)
            if self.follow_official_norm:
                # first D spectral norm, the rest weight norm (reference :750-757)
                p["use_weight_norm"] = i != 0
                p["use_spectral_norm"] = i == 0
            outs.append(
                HiFiGANScaleDiscriminator(**p, name=f"discriminators_{i}")(x)
            )
            x = avg_pool1d(x, **pool_params)
        return outs


class HiFiGANMultiScaleMultiPeriodDiscriminator(nn.Module):
    """MSD + MPD; returns concatenated list of per-D feature lists."""

    scales: int = 3
    scale_downsample_pooling: str = "AvgPool1d"
    scale_downsample_pooling_params: Any = None
    scale_discriminator_params: Any = None
    follow_official_norm: bool = True
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    period_discriminator_params: Any = None

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        msd_outs = HiFiGANMultiScaleDiscriminator(
            scales=self.scales,
            downsample_pooling=self.scale_downsample_pooling,
            downsample_pooling_params=self.scale_downsample_pooling_params,
            discriminator_params=self.scale_discriminator_params,
            follow_official_norm=self.follow_official_norm,
            name="msd",
        )(x)
        mpd_outs = HiFiGANMultiPeriodDiscriminator(
            periods=self.periods,
            discriminator_params=self.period_discriminator_params,
            name="mpd",
        )(x)
        return msd_outs + mpd_outs
