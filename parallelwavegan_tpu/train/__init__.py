"""Training stack: criterion bundle, jitted GAN step, steps-driven trainer."""

from parallelwavegan_tpu.train.criterion import Criterion  # noqa: F401
from parallelwavegan_tpu.train.state import TrainState  # noqa: F401
from parallelwavegan_tpu.train.step import build_train_step, build_eval_step  # noqa: F401
from parallelwavegan_tpu.train.trainer import Trainer  # noqa: F401
