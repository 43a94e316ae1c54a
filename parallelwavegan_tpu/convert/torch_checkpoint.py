"""Lossless conversion of reference torch checkpoints to native param trees.

Behavioral reference: the checkpoint layout written by
/root/reference/parallel_wavegan/bin/train.py:114-146 ({model: {generator,
discriminator}, optimizer, ...} torch pickles) and consumed by
utils.load_model (/root/reference/parallel_wavegan/utils/utils.py:294-360).

Design: for each model family we translate *names* (flax module paths ->
torch state-dict prefixes derived from the reference's Sequential/
ModuleList layouts) and *layouts* (torch OIK conv weights -> our TIO
gather-form kernels; weight-norm (g, v) pairs preserved exactly so decode
output matches bit-for-bit up to conv algebra). The flax tree structure
comes from ``jax.eval_shape`` on Module.init — no device compute.

torch is imported lazily: it is only needed when actually converting.
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torch checkpoint IO
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pkl checkpoint into numpy-valued nested dicts."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
        if isinstance(x, dict):
            return {k: to_np(v) for k, v in x.items()}
        return x

    return to_np(ckpt)


# ---------------------------------------------------------------------------
# path translators (flax module path -> torch state-dict prefix)
# ---------------------------------------------------------------------------


def _idx(seg: str) -> int:
    return int(seg.rsplit("_", 1)[1])


def make_generator_translator(gen_type: str, params: dict) -> Callable:
    if gen_type == "HiFiGANGenerator":
        return _t_hifigan_g
    if gen_type == "MelGANGenerator":
        return _make_t_melgan_g(params, prefix="melgan")
    if gen_type == "ParallelWaveGANGenerator":
        return _make_t_pwg_g(params)
    if gen_type == "StyleMelGANGenerator":
        return _t_style_melgan_g
    if gen_type == "UHiFiGANGenerator":
        return _t_uhifigan_g
    if gen_type == "VQVAE":
        return _make_t_vqvae(params)
    if gen_type in ("DiscreteSymbolHiFiGANGenerator",
                    "DiscreteSymbolDurationGenerator"):
        return _t_discrete_hifigan_g
    if gen_type == "DiscreteSymbolStyleMelGANGenerator":
        return _t_discrete_style_melgan_g
    raise ValueError(f"no torch translator for generator {gen_type!r}")


def make_discriminator_translator(dis_type: str, params: dict) -> Callable:
    if dis_type == "ParallelWaveGANDiscriminator":
        return _make_t_pwg_d(params)
    if dis_type == "ResidualParallelWaveGANDiscriminator":
        return _t_residual_pwg_d
    if dis_type == "MelGANDiscriminator":
        return _make_t_melgan_d(params)
    if dis_type == "MelGANMultiScaleDiscriminator":
        inner = _make_t_melgan_d(params)
        return _nest("discriminators", inner)
    if dis_type == "HiFiGANPeriodDiscriminator":
        return _t_hifigan_period_d
    if dis_type == "HiFiGANMultiPeriodDiscriminator":
        return _nest("discriminators", _t_hifigan_period_d)
    if dis_type == "HiFiGANScaleDiscriminator":
        return _make_t_hifigan_scale_d(params)
    if dis_type == "HiFiGANMultiScaleDiscriminator":
        inner = _make_t_hifigan_scale_d(params.get("discriminator_params", {}))
        return _nest("discriminators", inner)
    if dis_type == "HiFiGANMultiScaleMultiPeriodDiscriminator":
        scale_inner = _nest(
            "discriminators",
            _make_t_hifigan_scale_d(params.get("scale_discriminator_params", {})),
        )
        period_inner = _nest("discriminators", _t_hifigan_period_d)

        def translate(path):
            if path[0] == "msd":
                return "msd." + scale_inner(path[1:])
            if path[0] == "mpd":
                return "mpd." + period_inner(path[1:])
            raise KeyError(path)

        return translate
    if dis_type == "StyleMelGANDiscriminator":
        inner = _make_t_melgan_d(params.get("discriminator_params") or
                                 {"downsample_scales": [4, 4, 4, 1]})
        return _nest("discriminators", inner)
    raise ValueError(f"no torch translator for discriminator {dis_type!r}")


def _nest(outer_name: str, inner: Callable) -> Callable:
    def translate(path):
        assert path[0].startswith(outer_name + "_"), path
        return f"{outer_name}.{_idx(path[0])}." + inner(path[1:])

    return translate


def _t_hifigan_g(path):
    out = []
    for p in path:
        if p == "input_conv":
            out.append("input_conv")
        elif p.startswith("upsamples_"):
            out.append(f"upsamples.{_idx(p)}.1")
        elif p.startswith("blocks_"):
            out.append(f"blocks.{_idx(p)}")
        elif p.startswith("convs1_"):
            out.append(f"convs1.{_idx(p)}.1")
        elif p.startswith("convs2_"):
            out.append(f"convs2.{_idx(p)}.1")
        elif p == "output_conv":
            out.append("output_conv.1")
        elif p in ("conv", "deconv"):
            out.append(p)
        else:
            raise KeyError(f"hifigan path segment {p!r}")
    return ".".join(out)


def _make_t_melgan_g(params: dict, prefix: str = "melgan"):
    """Index map for the reference's single flat Sequential (melgan.py:67-157)."""
    causal = params.get("use_causal_conv", False)
    scales = params.get("upsample_scales", [8, 8, 2, 2])
    stacks = params.get("stacks", 3)
    layer_map = {}
    deconv_lis = set()
    li, idx = 0, 0
    if not causal:
        layer_map[0] = str(idx + 1)  # [pad, conv]
        idx += 2
    else:
        layer_map[0] = f"{idx}.conv"  # CausalConv1d
        idx += 1
    li = 1
    for _ in scales:
        idx += 1  # activation
        layer_map[li] = str(idx) if not causal else f"{idx}.deconv"
        deconv_lis.add(li)
        idx += 1
        li += 1
        for _ in range(stacks):
            layer_map[li] = str(idx)  # ResidualStack module
            idx += 1
            li += 1
    idx += 1  # activation
    if not causal:
        idx += 1  # pad
        layer_map[li] = str(idx)
    else:
        layer_map[li] = f"{idx}.conv"

    stack_map = (
        {"conv_dilated": "stack.2", "conv_1x1": "stack.4", "skip_conv": "skip_layer"}
        if not causal
        else {
            "conv_dilated": "stack.1.conv",
            "conv_1x1": "stack.3",
            "skip_conv": "skip_layer",
        }
    )

    def translate(path):
        assert path[0].startswith("layers_"), path
        out = [prefix, layer_map[_idx(path[0])]]
        for p in path[1:]:
            out.append(stack_map.get(p, p))
        return ".".join(out)

    translate.is_transpose = (
        lambda mods: len(mods) == 1
        and mods[0].startswith("layers_")
        and _idx(mods[0]) in deconv_lis
    )
    return translate


def _make_t_pwg_g(params: dict):
    upsample_params = params.get("upsample_params", {"upsample_scales": [4, 4, 4, 4]})
    upsample_net = params.get("upsample_net", "ConvInUpsampleNetwork")
    has_act = upsample_params.get("nonlinear_activation") is not None
    step = 3 if has_act else 2
    melgan_inner = None
    if upsample_net == "MelGANGenerator":
        melgan_inner = _make_t_melgan_g(upsample_params, prefix="melgan")

    def translate(path):
        out = []
        i = 0
        while i < len(path):
            p = path[i]
            if p == "first_conv":
                out.append("first_conv")
            elif p == "last_conv_1":
                out.append("last_conv_layers.1")
            elif p == "last_conv_2":
                out.append("last_conv_layers.3")
            elif p.startswith("conv_layers_"):
                out.append(f"conv_layers.{_idx(p)}")
            elif p == "upsample_net":
                if melgan_inner is not None:
                    return "upsample_net." + melgan_inner(path[i + 1 :])
                out.append("upsample_net")
            elif p == "conv_in":
                out.append("conv_in")
            elif p == "upsample":
                out.append("upsample")
            elif p in ("conv", "conv1x1_aux", "conv1x1_skip", "conv1x1_out"):
                out.append(p)
            else:
                raise KeyError(f"pwg path segment {p!r}")
            i += 1
        return ".".join(out)

    def leaf_hook(path, leaf):
        """UpsampleNetwork leaves conv_{i}[_v|_g] -> up_layers.{step*i+1}."""
        m = re.match(r"conv_(\d+)(?:_(v|g))?$", leaf)
        if m and path and path[-1] == "upsample":
            i = int(m.group(1))
            suffix = {"v": "weight_v", "g": "weight_g", None: "weight"}[m.group(2)]
            return f"up_layers.{step * i + 1}.{suffix}"
        return None

    translate.leaf_hook = leaf_hook

    def is_transpose(mods):
        if melgan_inner is not None and mods and mods[0] == "upsample_net":
            return melgan_inner.is_transpose(mods[1:])
        return False

    translate.is_transpose = is_transpose
    return translate


def _t_style_melgan_g(path):
    out = []
    for p in path:
        if p == "trunk":
            continue
        if p.startswith("noise_upsample_"):
            out.append(f"noise_upsample.{2 * _idx(p)}")
        elif p.startswith("blocks_"):
            out.append(f"blocks.{_idx(p)}")
        elif p in ("tade1", "tade2", "gated_conv1", "gated_conv2"):
            out.append(p)
        elif p == "aux_conv":
            out.append("aux_conv.0")
        elif p == "gated_conv":
            out.append("gated_conv.0")
        elif p == "output_conv":
            out.append("output_conv.0")
        else:
            raise KeyError(f"style_melgan path segment {p!r}")
    return ".".join(out)


def _t_uhifigan_g(path):
    """U-Net HiFiGAN (reference uhifigan.py:19-260).

    torch layout: input_conv/downsamples/upsamples are Sequentials with
    the conv at index 0/0/1; hidden_conv is a bare conv; output_conv has
    the conv at index 1; MRF ModuleLists are flat ``{down,up}samples_mrf``.
    """
    out = []
    for p in path:
        if p == "input_conv":
            out.append("input_conv.0")
        elif p.startswith("downsamples_mrf_"):
            out.append(f"downsamples_mrf.{_idx(p)}")
        elif p.startswith("upsamples_mrf_"):
            out.append(f"upsamples_mrf.{_idx(p)}")
        elif p.startswith("downsamples_"):
            out.append(f"downsamples.{_idx(p)}.0")
        elif p.startswith("upsamples_"):
            out.append(f"upsamples.{_idx(p)}.1")
        elif p == "hidden_conv":
            out.append("hidden_conv")
        elif p == "output_conv":
            out.append("output_conv.1")
        elif p.startswith("convs1_"):
            out.append(f"convs1.{_idx(p)}.1")
        elif p.startswith("convs2_"):
            out.append(f"convs2.{_idx(p)}.1")
        elif p in ("conv", "deconv"):
            out.append(p)
        else:
            raise KeyError(f"uhifigan path segment {p!r}")
    return ".".join(out)


def _make_t_vqvae(params: dict):
    """VQVAE (reference vqvae.py:16-147): MelGAN-D encoder + codebook +
    MelGAN-G decoder (+ local 1x1 conv / global embedding)."""
    enc_conf = dict(params.get("encoder_conf")
                    or {"downsample_scales": [4, 4, 2, 2]})
    dec_conf = dict(params.get("decoder_conf")
                    or {"upsample_scales": [4, 4, 2, 2], "stacks": 3})
    enc_inner = _make_t_melgan_d(enc_conf)
    dec_inner = _make_t_melgan_g(dec_conf, prefix="melgan")

    def translate(path):
        if path[0] == "encoder":
            return "encoder." + enc_inner(path[1:])
        if path[0] == "decoder":
            return "decoder." + dec_inner(path[1:])
        if path[0] == "codebook":
            return "codebook.embedding"
        if path[0] in ("local_embed", "global_embed"):
            return path[0]
        raise KeyError(f"vqvae path segment {path[0]!r}")

    def is_transpose(mods):
        if mods and mods[0] == "decoder":
            return dec_inner.is_transpose(mods[1:])
        return False

    translate.is_transpose = is_transpose
    return translate


def _t_duration_predictor(path):
    """FastSpeech DurationPredictor (reference layers/duration_predictor.py:
    17-90): conv.{i} Sequential = [Conv1d, ReLU, LayerNorm, Dropout]."""
    if not path:  # linear_kernel / linear_bias leaves live at module root
        return "linear"
    (p,) = path
    if p.startswith("conv_"):
        return f"conv.{_idx(p)}.0"
    if p.startswith("norm_"):
        return f"conv.{_idx(p)}.2"
    raise KeyError(f"duration-predictor path segment {p!r}")


def _t_discrete_hifigan_g(path):
    """DiscreteSymbol{HiFiGAN,Duration}Generator (reference hifigan.py:867,
    :1094): emb/spk_emb embeddings + the HiFiGAN trunk at the root (+ the
    duration predictor for the duration variant)."""
    if path[0] == "embedding":
        assert path[1] in ("emb", "spk_emb"), path
        return path[1]
    if path[0] == "duration_predictor":
        return "duration_predictor." + _t_duration_predictor(path[1:])
    if path[0] == "trunk":
        return _t_hifigan_g(path[1:])
    raise KeyError(f"discrete-hifigan path segment {path[0]!r}")


def _t_discrete_style_melgan_g(path):
    """DiscreteSymbolStyleMelGANGenerator (reference style_melgan.py:364):
    emb/spk_emb + the StyleMelGAN trunk at the root."""
    if path[0] in ("emb", "spk_emb"):
        return path[0]
    return _t_style_melgan_g(path)


def _make_t_pwg_d(params: dict):
    layers = params.get("layers", 10)

    def translate(path):
        (p,) = path
        if p.startswith("conv_layers_"):
            return f"conv_layers.{2 * _idx(p)}"
        if p == "last_conv":
            return f"conv_layers.{2 * (layers - 1)}"
        raise KeyError(f"pwg-d path segment {p!r}")

    return translate


def _t_residual_pwg_d(path):
    out = []
    for p in path:
        if p == "first_conv":
            out.append("first_conv.0")
        elif p.startswith("conv_layers_"):
            out.append(f"conv_layers.{_idx(p)}")
        elif p == "last_conv_1":
            out.append("last_conv_layers.1")
        elif p == "last_conv_2":
            out.append("last_conv_layers.3")
        elif p in ("conv", "conv1x1_aux", "conv1x1_skip", "conv1x1_out"):
            out.append(p)
        else:
            raise KeyError(f"residual-pwg-d path segment {p!r}")
    return ".".join(out)


def _make_t_melgan_d(params: dict):
    nd = len(params.get("downsample_scales", [4, 4, 4, 4]))
    last = nd + 2

    def translate(path):
        (p,) = path
        assert p.startswith("layers_"), p
        i = _idx(p)
        if i == 0:
            return "layers.0.1"
        if i < last:
            return f"layers.{i}.0"
        return f"layers.{last}"

    return translate


def _make_t_hifigan_scale_d(params: dict):
    nd = len(params.get("downsample_scales", [2, 2, 4, 4, 1]))
    last = nd + 2

    def translate(path):
        (p,) = path
        assert p.startswith("layers_"), p
        i = _idx(p)
        if i < last:
            return f"layers.{i}.0"
        return f"layers.{last}"

    return translate


def _t_hifigan_period_d(path):
    (p,) = path
    if p.startswith("convs_"):
        return f"convs.{_idx(p)}.0"
    if p == "output_conv":
        return "output_conv"
    raise KeyError(f"period-d path segment {p!r}")


# ---------------------------------------------------------------------------
# leaf layout conversion
# ---------------------------------------------------------------------------


_CONV_PERM = (2, 1, 0)  # torch Conv1d (O, I, K) -> ours (K, I, O)
_DECONV_PERM = (2, 0, 1)  # torch ConvTranspose1d (I, O, K) -> ours (K, I, O)
_CONV2D_PERM = (2, 3, 1, 0)  # torch Conv2d (O, I, Kh, Kw) -> ours (Kh, Kw, I, O)
_UPCONV2D_PERM = (3, 2, 1, 0)  # up_layers Conv2d (1, 1, F, T) -> ours (T, F, 1, 1)


def _permute(w: np.ndarray, perm, target_shape) -> np.ndarray:
    w = np.transpose(np.asarray(w), perm)
    if w.shape != tuple(target_shape):
        raise ValueError(
            f"converted weight shape {w.shape} != expected {tuple(target_shape)}"
        )
    return w


def _reshape(w: np.ndarray, target_shape) -> np.ndarray:
    w = np.asarray(w)
    if w.size != int(np.prod(target_shape)):
        raise ValueError(f"cannot reshape {w.shape} -> {tuple(target_shape)}")
    return w.reshape(target_shape)


def _is_transpose_module(mods, translate, leaves) -> bool:
    """A module holds a ConvTranspose1d kernel?

    Primary signal: the weight-norm g keeps the *input*-channel axis for
    transposes ((1, I, 1) here vs (1, 1, O) for convs). Fallback: the
    translator's ``is_transpose`` path hint (for norm-free models).
    """
    g = leaves.get("g")
    if g is not None and len(g.shape) == 3:
        if g.shape[1] > 1:
            return True
        if g.shape[2] > 1:
            return False
    hint = getattr(translate, "is_transpose", None)
    if hint is not None:
        return hint(mods)
    return any(
        seg == "deconv" or seg.startswith(("upsamples_", "noise_upsample_"))
        for seg in mods
    )


def _convert_tree(sd: dict, template, translate: Callable) -> dict:
    """Template pytree (eval_shape) -> numpy params fetched from torch sd."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(template)
    # group leaves per module so conv-kind can be inferred from siblings
    modules: dict[tuple, dict] = {}
    for path, spec in flat.items():
        modules.setdefault(tuple(path[:-1]), {})[path[-1]] = spec

    out = {}
    leaf_hook = getattr(translate, "leaf_hook", None)
    for mods, leaves in modules.items():
        hooked_all = False
        if leaf_hook:
            # hook handles whole leaf names like conv_{i}_v (UpsampleNetwork)
            for leaf, spec in leaves.items():
                key_suffix = leaf_hook(list(mods), leaf)
                if key_suffix is not None:
                    prefix = translate(list(mods)) if mods else ""
                    key = f"{prefix}.{key_suffix}" if prefix else key_suffix
                    if leaf.endswith("_g"):
                        out[mods + (leaf,)] = _reshape(sd[key], spec.shape)
                    else:
                        out[mods + (leaf,)] = _permute(
                            sd[key], _UPCONV2D_PERM, spec.shape
                        )
                    hooked_all = True
            if hooked_all:
                continue
        prefix = translate(list(mods))
        is_transpose = _is_transpose_module(list(mods), translate, leaves)
        for leaf, spec in leaves.items():
            shape = spec.shape
            if leaf == "bias":
                out[mods + (leaf,)] = _reshape(sd[f"{prefix}.bias"], shape)
            elif leaf == "g":
                out[mods + (leaf,)] = _reshape(sd[f"{prefix}.weight_g"], shape)
            elif leaf in ("v", "kernel"):
                if leaf == "v":
                    w = sd[f"{prefix}.weight_v"]
                else:
                    w = sd.get(f"{prefix}.weight", sd.get(f"{prefix}.weight_orig"))
                    if w is None:
                        raise KeyError(f"{prefix}.weight")
                if len(shape) == 4:
                    out[mods + (leaf,)] = _permute(w, _CONV2D_PERM, shape)
                elif is_transpose:
                    # our gather-form deconv kernel is the torch weight
                    # flipped along K (ops/conv.py conv_transpose1d)
                    out[mods + (leaf,)] = _permute(w, _DECONV_PERM, shape)[::-1].copy()
                else:
                    out[mods + (leaf,)] = _permute(w, _CONV_PERM, shape)
            elif leaf in ("embedding", "scale"):
                # nn.Embed table / LayerNorm scale — torch calls both "weight"
                out[mods + (leaf,)] = _reshape(sd[f"{prefix}.weight"], shape)
            elif leaf in ("linear_kernel",):
                out[mods + (leaf,)] = _permute(
                    sd[f"{prefix}.weight"], (1, 0), shape
                )
            elif leaf == "linear_bias":
                out[mods + (leaf,)] = _reshape(sd[f"{prefix}.bias"], shape)
            else:
                raise KeyError(f"unknown leaf kind {leaf!r} at {mods}")
    return unflatten_dict(out)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _eval_shape_init(model_type: str, model_params: dict, rngs=None):
    """Template variables via eval_shape with family-appropriate dummy input."""
    from parallelwavegan_tpu.models import get_model_class

    module = get_model_class(model_type)(**model_params)
    key = jax.random.key(0)
    b = 1
    if model_type == "ParallelWaveGANGenerator":
        factor = 1
        for s in (model_params.get("upsample_params")
                  or {"upsample_scales": [4, 4, 4, 4]})["upsample_scales"]:
            factor *= s
        win = model_params.get("aux_context_window", 2)
        t = 8
        z = jnp.zeros((b, t * factor, model_params.get("in_channels", 1)))
        c = jnp.zeros((b, t + 2 * win, model_params.get("aux_channels", 80)))
        return module, jax.eval_shape(module.init, key, z, c)
    if model_type == "StyleMelGANGenerator":
        nuf = 1
        for s in model_params.get("noise_upsample_scales", [11, 2, 2, 2]):
            nuf *= s
        c = jnp.zeros((b, nuf, model_params.get("aux_channels", 80)))
        z = jnp.zeros((b, 1, model_params.get("in_channels", 128)))
        return module, jax.eval_shape(module.init, {"params": key}, c, z)
    if model_type in ("MelGANGenerator", "HiFiGANGenerator"):
        c = jnp.zeros((b, 8, model_params.get("in_channels", 80)))
        return module, jax.eval_shape(module.init, key, c)
    if model_type == "UHiFiGANGenerator":
        factor = 1
        for s in model_params.get("downsample_scales", (8, 8, 2, 2)):
            factor *= s
        t = 8
        e = jnp.zeros((b, t * factor, model_params.get("out_channels", 1)))
        c = jnp.zeros((b, t, model_params.get("in_channels", 80)))
        return module, jax.eval_shape(module.init, key, e, c)
    if model_type == "VQVAE":
        factor = 1
        enc_conf = model_params.get("encoder_conf") or {}
        for s in enc_conf.get("downsample_scales", [4, 4, 2, 2]):
            factor *= s
        t = 8
        x = jnp.zeros((b, t * factor, model_params.get("in_channels", 1)))
        args = [x]
        if model_params.get("num_local_embeds") is not None:
            args.append(jnp.zeros((b, t, model_params["num_local_embeds"])))
        else:
            args.append(None)
        if model_params.get("num_global_embeds") is not None:
            args.append(jnp.zeros((b,), jnp.int32))
        return module, jax.eval_shape(module.init, key, *args)
    if model_type in ("DiscreteSymbolHiFiGANGenerator",
                      "DiscreteSymbolDurationGenerator"):
        nc = 2 if model_params.get("num_spk_embs", 128) > 0 else 1
        c = jnp.zeros((b, 8, nc), jnp.int32)
        if model_type == "DiscreteSymbolDurationGenerator":
            ds = jnp.ones((b, 8), jnp.int32)
            # out_length is static — close over it so eval_shape doesn't
            # abstract it into a tracer
            return module, jax.eval_shape(
                lambda k, c_, d_: module.init(k, c_, d_, 16), key, c, ds
            )
        return module, jax.eval_shape(module.init, key, c)
    if model_type == "DiscreteSymbolStyleMelGANGenerator":
        nuf = 1
        for s in model_params.get("noise_upsample_scales", [11, 2, 2, 2]):
            nuf *= s
        c = jnp.zeros((b, nuf, 2), jnp.int32)
        z = jnp.zeros((b, 1, model_params.get("in_channels", 128)))
        return module, jax.eval_shape(module.init, {"params": key}, c, z)
    if model_type == "StyleMelGANDiscriminator":
        ws = max(model_params.get("window_sizes", [512, 1024, 2048, 4096]))
        x = jnp.zeros((b, ws + 64, 1))
        return module, jax.eval_shape(
            module.init, {"params": key, "rwd": key}, x
        )
    # waveform discriminators
    x = jnp.zeros((b, 4096, model_params.get("in_channels", 1)))
    return module, jax.eval_shape(module.init, key, x)


def convert_state_dict(model_type: str, model_params: dict, sd: dict):
    """torch state dict -> (params, extra_vars) for one model."""
    model_params = {
        k.replace("upsample_kernal_sizes", "upsample_kernel_sizes"): v
        for k, v in model_params.items()
    }
    try:
        translate = make_generator_translator(model_type, model_params)
    except ValueError:
        translate = make_discriminator_translator(model_type, model_params)
    _, variables = _eval_shape_init(model_type, model_params)
    params = _convert_tree(sd, variables["params"], translate)
    extra = {}
    if "spectral" in variables:
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(variables["spectral"])
        out = {}
        for path, spec in flat.items():
            *mods, leaf = path  # 'u' or 'v' power-iteration vectors
            prefix = translate(list(mods))
            out[path] = _reshape(sd[f"{prefix}.weight_{leaf}"], spec.shape)
        extra["spectral"] = unflatten_dict(out)
    return params, extra


def convert_generator_state_dict(checkpoint_path: str, gen_type: str,
                                 gen_params: dict):
    """Reference checkpoint -> native generator (params, vars)."""
    ckpt = load_torch_checkpoint(checkpoint_path)
    sd = ckpt["model"]["generator"]
    return convert_state_dict(gen_type, gen_params, sd)
