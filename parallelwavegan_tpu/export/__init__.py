"""Model export (TFLite via jax2tf).

TPU-native counterpart of the reference's TF side branch
(/root/reference/parallel_wavegan/models/tf_models.py + the
convert_melgan_from_pytorch_to_tensorflow notebook): instead of
maintaining a hand-written Keras mirror of each generator, any flax
generator exports through jax2tf -> TFLite directly.
"""

from parallelwavegan_tpu.export.tflite import export_tflite  # noqa: F401
