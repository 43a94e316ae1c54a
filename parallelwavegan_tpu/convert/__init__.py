"""Reference-checkpoint conversion (torch pickle -> native param trees)."""

from parallelwavegan_tpu.convert.torch_checkpoint import (  # noqa: F401
    convert_generator_state_dict,
    convert_state_dict,
    load_torch_checkpoint,
)
