"""Cross-trainer loss-trajectory A/B vs the reference torch trainer.

Runs the reference's OWN ``Trainer._train_step``
(/root/reference/parallel_wavegan/bin/train.py:189-340) and our jitted
train step from identical converted weights on identical batches, and
asserts the per-step G/D losses track within float32 accumulation
tolerance. This is the offline substitute for pretrained-checkpoint
parity (network-blocked): it pins the trainer, all losses, the converter
AND the optimizer semantics end to end.

Full 100-step, 3-family report: ``benchmarks/ab_reference_trainer.py``
-> docs/TRAINER_AB.json (committed).
"""

import os
import sys

import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference/parallel_wavegan"):
    pytest.skip(
        "reference implementation not available at /root/reference",
        allow_module_level=True,
    )

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.ab_reference_trainer import run_ab  # noqa: E402

# float32 conv/optimizer noise accumulates with step count; these bounds
# are ~10x the measured drift of the 100-step committed report
FIRST_STEP_TOL = 1e-4
DRIFT_TOL = 5e-3
STEPS = 12


@pytest.mark.parametrize("family", ["hifigan", "pwg"])
def test_losses_track_reference_trainer(family, tmp_path):
    res = run_ab(family, STEPS, outdir=str(tmp_path))
    summary = res["summary"]
    assert summary, "no overlapping loss keys between the two trainers"
    for key, s in summary.items():
        # identical weights + identical batch => step 1 is forward-only
        # numerics (conv reduction order), no optimizer drift yet
        assert s["first_step_rel"] < FIRST_STEP_TOL, (key, s)
        assert s["max_rel"] < DRIFT_TOL, (key, s)
