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


def test_stylemelgan_tflite_roundtrip_with_explicit_noise(tmp_path):
    """StyleMelGAN exports with the noise track as a second input."""
    G = get_model_class("StyleMelGANGenerator")(
        in_channels=16, aux_channels=10, channels=16,
        noise_upsample_scales=[2, 2], upsample_scales=[2, 2],
        kernel_size=3, dilation=2,
    )
    nuf = G.noise_upsample_factor  # 4
    noise_frames, mel_frames = 8, 8 * nuf
    c = jnp.zeros((1, mel_frames, 10))
    z = jnp.zeros((1, noise_frames, 16))
    params = G.init(jax.random.key(0), c, z)["params"]

    buf = export_tflite(G, params, mel_frames, 10,
                        noise_shape=(noise_frames, 16))
    interp = tf.lite.Interpreter(model_content=buf)
    interp.allocate_tensors()
    inputs = {d["name"].split(":")[0]: d for d in interp.get_input_details()}
    out = interp.get_output_details()[0]
    rs = np.random.RandomState(0)
    x = rs.randn(1, mel_frames, 10).astype(np.float32)
    zn = rs.randn(1, noise_frames, 16).astype(np.float32)
    interp.set_tensor(inputs["mel"]["index"], x)
    interp.set_tensor(inputs["noise"]["index"], zn)
    interp.invoke()
    y_lite = interp.get_tensor(out["index"])
    y_ref = np.asarray(G.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(zn)))
    np.testing.assert_allclose(y_lite, y_ref, atol=1e-5)
