"""TFLite export of trained generators.

Replaces the reference's notebook-driven TFMelGANGenerator mirror
(models/tf_models.py:18, layers/tf_layers.py): jax2tf stages the exact
flax forward into a TF concrete function, which the TFLite converter
serializes. Works for any mel->wave generator with a fixed input length
(TFLite needs static shapes, like the reference's converted models).
"""

from __future__ import annotations


def export_tflite(
    generator,
    params,
    mel_frames: int,
    num_mels: int,
    output_path: str | None = None,
    allow_custom_ops: bool = True,
) -> bytes:
    """Export ``generator.apply({'params': params}, mel)`` to TFLite bytes.

    Args:
        generator: a flax mel->wave generator module (e.g. MelGANGenerator).
        params: its parameter pytree.
        mel_frames: fixed input length in frames.
        num_mels: mel channel count.
        output_path: optional path to write the .tflite flatbuffer.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    def forward(c):
        return generator.apply({"params": params}, c)

    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False),
        input_signature=[
            tf.TensorSpec([1, mel_frames, num_mels], tf.float32, name="mel")
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    converter.allow_custom_ops = allow_custom_ops
    tflite_model = converter.convert()
    if output_path is not None:
        with open(output_path, "wb") as f:
            f.write(tflite_model)
    return tflite_model
