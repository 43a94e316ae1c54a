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
    noise_shape: tuple | None = None,
) -> bytes:
    """Export ``generator.apply({'params': params}, mel[, noise])`` to TFLite.

    Args:
        generator: a flax mel->wave generator module (e.g. MelGANGenerator).
        params: its parameter pytree.
        mel_frames: fixed input length in frames.
        num_mels: mel channel count.
        output_path: optional path to write the .tflite flatbuffer.
        noise_shape: for generators with an internal RNG (StyleMelGAN),
            the (noise_frames, noise_channels) of an explicit noise input —
            exported models take (mel, noise) so inference stays a pure
            function (TFLite has no PRNG; the caller samples N(0, 1)).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    if noise_shape is None:
        def forward(c):
            return generator.apply({"params": params}, c)

        signature = [
            tf.TensorSpec([1, mel_frames, num_mels], tf.float32, name="mel")
        ]
    else:
        nuf = getattr(generator, "noise_upsample_factor", None)
        if nuf is not None:
            assert mel_frames == noise_shape[0] * nuf, (
                f"mel_frames must be noise_frames * {nuf}"
            )

        def forward(c, z):
            return generator.apply({"params": params}, c, z)

        signature = [
            tf.TensorSpec([1, mel_frames, num_mels], tf.float32, name="mel"),
            tf.TensorSpec([1, *noise_shape], tf.float32, name="noise"),
        ]

    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False),
        input_signature=signature,
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
