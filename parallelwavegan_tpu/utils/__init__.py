"""Utilities: IO, config, checkpointing, model loading, pretrained hub."""

from parallelwavegan_tpu.utils.io import (  # noqa: F401
    HDF5ScpLoader,
    NpyScpLoader,
    find_files,
    read_hdf5,
    read_wav,
    write_hdf5,
    write_wav,
)
from parallelwavegan_tpu.utils.config import (  # noqa: F401
    dump_config,
    load_config,
    merge_args,
)
from parallelwavegan_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    load_generator_params,
    save_checkpoint,
)
from parallelwavegan_tpu.utils.model import load_model  # noqa: F401
from parallelwavegan_tpu.utils.hub import (  # noqa: F401
    PRETRAINED_MODEL_LIST,
    download_pretrained_model,
)
