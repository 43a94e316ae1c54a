"""TFLite export round-trip (the TF side-branch counterpart)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parallelwavegan_tpu.export import export_tflite  # noqa: E402
from parallelwavegan_tpu.models import get_model_class  # noqa: E402


def test_melgan_tflite_roundtrip(tmp_path):
    G = get_model_class("MelGANGenerator")(
        in_channels=10, channels=32, upsample_scales=[4, 4], stacks=1
    )
    c = jnp.zeros((1, 16, 10))
    params = G.init(jax.random.key(0), c)["params"]
    path = str(tmp_path / "melgan.tflite")
    buf = export_tflite(G, params, 16, 10, output_path=path)
    assert len(buf) > 1000

    interp = tf.lite.Interpreter(model_content=buf)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    x = np.random.RandomState(0).randn(1, 16, 10).astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    y_lite = interp.get_tensor(out["index"])
    y_ref = np.asarray(G.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_lite, y_ref, atol=1e-5)
