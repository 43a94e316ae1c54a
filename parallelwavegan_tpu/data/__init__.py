"""Data pipeline: datasets, random-crop collater, prefetching host loader.

Replaces the reference's torch DataLoader + DistributedSampler stack
(/root/reference/parallel_wavegan/bin/train.py:646-925, 1311-1361 and
/root/reference/parallel_wavegan/datasets/) with a numpy dataset layer, a
pure-numpy collater producing fixed-shape NTC batches (jit-friendly static
shapes), and a thread-prefetched loader with per-host utterance sharding.
"""

from parallelwavegan_tpu.data.datasets import (  # noqa: F401
    AudioDataset,
    AudioMelDataset,
    AudioMelF0ExcitationDataset,
    AudioMelSCPDataset,
    AudioSCPDataset,
    MelDataset,
    MelF0ExcitationDataset,
    MelSCPDataset,
)
from parallelwavegan_tpu.data.collater import Collater  # noqa: F401
from parallelwavegan_tpu.data.loader import DataLoader  # noqa: F401
