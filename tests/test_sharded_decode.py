"""Temporal-sharded decode equivalence vs one-shot decode (8-device mesh).

New multi-chip capability over the reference (its decode is single-GPU per
utterance, bin/decode.py:214-234): InferenceModel.inference_sharded cuts a
single utterance's mel into one context-padded window per mesh device and
runs them as ONE sharded XLA program. With context covering the receptive
field the reassembled waveform must equal the one-shot inference() exactly.
"""

import jax
import numpy as np
import pytest

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.parallel.mesh import make_mesh
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


@pytest.mark.parametrize("gtype,params,t", [
    ("HiFiGANGenerator", HIFIGAN_PARAMS, 1024),
    ("HiFiGANGenerator", HIFIGAN_PARAMS, 1003),  # ragged last chunk
    ("MelGANGenerator", MELGAN_PARAMS, 777),
])
def test_sharded_matches_one_shot(gtype, params, t):
    import jax.numpy as jnp

    model = _build(gtype, params, (jnp.zeros((1, 32, 8)),))
    mesh = make_mesh()
    assert np.prod(list(mesh.shape.values())) == 8
    c = np.random.RandomState(0).randn(t, 8).astype(np.float32)
    ref = np.asarray(model.inference(c))
    out = model.inference_sharded(c, mesh, context_frames=32)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)


def test_sharded_pwg_noise_consistency():
    """PWG draws z once for the utterance; shared rng must reproduce the
    one-shot output exactly (overlapping windows slice the same track)."""
    import jax.numpy as jnp

    # init example: 16 mel frames, aux_context_window=2 -> (16-4)*16 samples
    model = _build(
        "ParallelWaveGANGenerator", PWG_PARAMS,
        (jnp.zeros((1, 12 * 16, 1)), jnp.zeros((1, 16, 8))),
    )
    mesh = make_mesh()
    c = np.random.RandomState(1).randn(512, 8).astype(np.float32)
    rng = jax.random.key(7)
    ref = np.asarray(model.inference(c, rng=rng))
    out = model.inference_sharded(c, mesh, context_frames=32, rng=rng)
    assert out.shape == ref.shape
    # identical z windows + identical convs; interior margins discarded
    np.testing.assert_array_equal(out, ref)


def test_sharded_chunk_smaller_than_context():
    """chunk < context_frames (mid-length utterance, many devices): edge
    windows clamp into [0, t-win] — which pins them to a true utterance
    edge, so exactness is preserved rather than crashing np.stack."""
    import jax.numpy as jnp

    model = _build("HiFiGANGenerator", HIFIGAN_PARAMS, (jnp.zeros((1, 32, 8)),))
    mesh = make_mesh()
    c = np.random.RandomState(3).randn(200, 8).astype(np.float32)
    ref = np.asarray(model.inference(c))
    out = model.inference_sharded(c, mesh, context_frames=64)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)


def test_sharded_short_utterance_falls_back():
    import jax.numpy as jnp

    model = _build("MelGANGenerator", MELGAN_PARAMS, (jnp.zeros((1, 32, 8)),))
    mesh = make_mesh()
    c = np.random.RandomState(2).randn(40, 8).astype(np.float32)
    ref = np.asarray(model.inference(c))
    out = np.asarray(model.inference_sharded(c, mesh, context_frames=32))
    np.testing.assert_array_equal(out, ref)


def test_sharded_rejects_global_in_time_models():
    import jax.numpy as jnp

    params = dict(in_channels=8, aux_channels=8, channels=16,
                  upsample_scales=[4, 4], noise_upsample_scales=[2, 2])
    G = get_model_class("StyleMelGANGenerator")(**params)
    variables = G.init(
        jax.random.key(0), jnp.zeros((1, 16, 8)), jnp.zeros((1, 4, 8)))
    config = {"generator_type": "StyleMelGANGenerator",
              "generator_params": params}
    model = InferenceModel(G, variables["params"], config)
    with pytest.raises(ValueError, match="not shardable"):
        model.inference_sharded(np.zeros((100, 8), np.float32), make_mesh())
