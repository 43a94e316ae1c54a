"""Streaming (chunked) decode equivalence vs full-utterance decode.

New capability over the reference (SURVEY.md §5): InferenceModel.
inference_streaming processes unbounded mels in fixed-shape chunks with
receptive-field context; with enough context the chunked output must match
the one-shot forward (boundary chunks share the model's true edge padding).
"""

import jax
import numpy as np
import pytest

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.utils.model import InferenceModel

HIFIGAN_PARAMS = {
    "in_channels": 8,
    "out_channels": 1,
    "channels": 16,
    "upsample_scales": [4, 4],
    "upsample_kernel_sizes": [8, 8],
    "resblock_kernel_sizes": [3, 5],
    "resblock_dilations": [[1, 3], [1, 3]],
}
MELGAN_PARAMS = {
    "in_channels": 8,
    "out_channels": 1,
    "channels": 16,
    "upsample_scales": [4, 4],
    "stacks": 2,
}
PWG_PARAMS = {
    "in_channels": 1,
    "out_channels": 1,
    "layers": 6,
    "stacks": 2,
    "residual_channels": 8,
    "gate_channels": 16,
    "skip_channels": 8,
    "aux_channels": 8,
    "aux_context_window": 2,
    "upsample_net": "ConvInUpsampleNetwork",
    "upsample_params": {"upsample_scales": [4, 4]},
}


def _build(gtype, params, example):
    G = get_model_class(gtype)(**params)
    variables = G.init(jax.random.key(0), *example)
    config = {"generator_type": gtype, "generator_params": dict(params)}
    rest = {k: v for k, v in variables.items() if k != "params"}
    return InferenceModel(G, variables["params"], config, vars_g=rest)


@pytest.mark.parametrize("gtype,params", [
    ("HiFiGANGenerator", HIFIGAN_PARAMS),
    ("MelGANGenerator", MELGAN_PARAMS),
])
def test_streaming_matches_full(gtype, params):
    import jax.numpy as jnp

    model = _build(gtype, params, (jnp.zeros((1, 16, 8)),))
    rs = np.random.RandomState(0)
    mel = rs.randn(229, 8).astype(np.float32)  # odd length, > chunk+ctx

    # true-length one-shot forward (bucketed inference() edge-pads the
    # tail, which changes the last receptive field; streaming keeps the
    # true end boundary, so compare against the exact-length program)
    full = np.asarray(jax.device_get(
        model._compiled_stream(mel.shape[0])(mel, np.zeros((0,), np.float32))
    ))
    chunked = model.inference_streaming(mel, chunk_frames=64,
                                        context_frames=32)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=2e-4, rtol=1e-3)


def test_streaming_pwg_global_noise():
    """PWG: one global noise track -> chunked decode equals one-shot."""
    import jax.numpy as jnp

    # init example: 16 mel frames, aux_context_window=2 -> (16-4)*16 samples
    model = _build(
        "ParallelWaveGANGenerator", PWG_PARAMS,
        (jnp.zeros((1, 12 * 16, 1)), jnp.zeros((1, 16, 8))),
    )
    rs = np.random.RandomState(1)
    mel = rs.randn(229, 8).astype(np.float32)
    rng = jax.random.key(42)

    chunked = model.inference_streaming(
        mel, chunk_frames=64, context_frames=32, rng=rng)
    # reference one-shot with the same noise: replicate streaming's draw
    z_all = jax.random.normal(rng, (mel.shape[0] * 16,))
    fwd = model._compiled_stream(mel.shape[0])
    full = np.asarray(jax.device_get(fwd(jnp.asarray(mel), z_all)))
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=2e-4, rtol=1e-3)


def test_streaming_rejects_global_ops():
    import jax.numpy as jnp

    params = {"in_channels": 8, "aux_channels": 8, "channels": 16,
              "noise_upsample_scales": [2, 2], "upsample_scales": [2, 2],
              "kernel_size": 3, "dilation": 2}
    G = get_model_class("StyleMelGANGenerator")(**params)
    config = {"generator_type": "StyleMelGANGenerator",
              "generator_params": dict(params)}
    model = InferenceModel(G, {}, config)
    with pytest.raises(ValueError, match="not streamable"):
        model.inference_streaming(np.zeros((100, 8), np.float32))


def test_streaming_short_input_falls_back():
    import jax.numpy as jnp

    model = _build("HiFiGANGenerator", HIFIGAN_PARAMS,
                   (jnp.zeros((1, 16, 8)),))
    mel = np.random.RandomState(2).randn(40, 8).astype(np.float32)
    y = model.inference_streaming(mel, chunk_frames=64, context_frames=32)
    np.testing.assert_allclose(y, model.inference(mel), atol=2e-4, rtol=1e-3)
