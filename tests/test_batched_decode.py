"""Batched decode: one forward per length bucket, equal to per-utt decode.

Serving-throughput capability beyond the reference (its decode loop is
strictly utterance-by-utterance, bin/decode.py:214-234). Checks numeric
equivalence with the single-utterance path and the mesh-sharded variant
on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
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
    "resblock_kernel_sizes": [3],
    "resblock_dilations": [[1, 3]],
}


def _model():
    G = get_model_class("HiFiGANGenerator")(**HIFIGAN_PARAMS)
    variables = G.init(jax.random.key(0), jnp.zeros((1, 16, 8)))
    config = {"generator_type": "HiFiGANGenerator",
              "generator_params": dict(HIFIGAN_PARAMS)}
    return InferenceModel(G, variables["params"], config)


def test_batched_matches_single():
    model = _model()
    rs = np.random.RandomState(0)
    mels = [rs.randn(t, 8).astype(np.float32) for t in (40, 64, 33)]
    ys = model.inference_batch(mels)
    for c, y in zip(mels, ys):
        y_single = model.inference(c)
        assert y.shape == y_single.shape == (c.shape[0] * 16, 1)
        np.testing.assert_allclose(y, y_single, atol=2e-4, rtol=1e-3)


def test_batched_sharded_over_mesh():
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    model = _model()
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rs = np.random.RandomState(1)
    # all lengths share the 64-frame bucket, so per-utt and batched
    # decodes see identical edge padding; 5 utts -> padded to 8 rows
    mels = [rs.randn(t, 8).astype(np.float32)
            for t in (33, 40, 47, 55, 64)]
    ys = model.inference_batch(mels, mesh=mesh)
    assert len(ys) == 5
    for c, y in zip(mels, ys):
        np.testing.assert_allclose(
            y, model.inference(c), atol=2e-4, rtol=1e-3)


def test_batched_rejects_global_ops():
    params = {"in_channels": 8, "aux_channels": 8, "channels": 16,
              "noise_upsample_scales": [2, 2], "upsample_scales": [2, 2],
              "kernel_size": 3, "dilation": 2}
    G = get_model_class("StyleMelGANGenerator")(**params)
    model = InferenceModel(G, {}, {"generator_type": "StyleMelGANGenerator",
                                   "generator_params": dict(params)})
    with pytest.raises(ValueError, match="batched decode"):
        model.inference_batch([np.zeros((32, 8), np.float32)])
