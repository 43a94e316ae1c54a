#!/usr/bin/env python3
"""Full-scale training-throughput measurement on synthetic long-form data.

Closes the BASELINE.md training matrix (VERDICT round-1 next-step #1):
synthesizes long utterances at the config's sampling rate, runs the real
preprocess -> stats -> normalize -> train pipeline, and reports
steady-state steps/s from the trainer's own train/steps_per_sec log lines
(the same methodology as the round-1 HiFi-GAN/MB-MelGAN numbers).

Usage:
  python benchmarks/measure_train.py --config benchmarks/conf/<cfg>.yaml \
      [--steps 200] [--workdir /tmp/train_bench]

Prints one JSON line: {"config": ..., "steps_per_sec": ..., "samples_per_sec": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthesize(wav_dir: str, fs: int, n_utts: int, dur: float) -> None:
    from parallelwavegan_tpu.utils.io import write_wav

    os.makedirs(wav_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n_utts):
        t = np.arange(int(fs * dur)) / fs
        f0 = rs.uniform(110, 220)
        wav = np.zeros_like(t)
        for h in range(1, 5):
            wav += np.sin(2 * np.pi * f0 * h * t + rs.rand() * 6.28) / h
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rs.uniform(1.0, 3.0) * t)
        wav = 0.3 * wav * am + 0.005 * rs.randn(len(t))
        write_wav(os.path.join(wav_dir, f"perf{i:04d}.wav"), fs,
                  wav.astype(np.float32))


def run(cmd, **kw):
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--log-interval", type=int, default=25)
    ap.add_argument("--utts", type=int, default=48)
    ap.add_argument("--dur", type=float, default=6.0)
    ap.add_argument("--workdir", default="/tmp/train_bench")
    ap.add_argument("--fresh-data", action="store_true")
    ap.add_argument(
        "--override", action="append", default=[], metavar="KEY=YAMLVALUE",
        help="config override, e.g. --override mixed_precision=true "
        "(dots descend into nested dicts)")
    ap.add_argument("--tag", default="", help="suffix for workdir artifacts")
    args = ap.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)
    for ov in args.override:
        key, _, val = ov.partition("=")
        node, parts = config, key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    fs = config["sampling_rate"]
    name = os.path.splitext(os.path.basename(args.config))[0]
    if args.tag:
        name = f"{name}_{args.tag}"

    data_dir = os.path.join(args.workdir, f"data_{fs}_{args.utts}x{args.dur}")
    wav_dir = os.path.join(data_dir, "wav")
    if args.fresh_data and os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    if not os.path.isdir(wav_dir):
        synthesize(wav_dir, fs, args.utts, args.dur)

    # per-config feature dump (feature params may differ between configs)
    dump = os.path.join(args.workdir, f"dump_{name}_{args.utts}x{args.dur}")
    py = sys.executable
    if not os.path.isdir(os.path.join(dump, "norm")):
        run([py, "-m", "parallelwavegan_tpu.bin.preprocess",
             "--config", args.config, "--rootdir", wav_dir,
             "--dumpdir", os.path.join(dump, "raw"), "--verbose", "1"])
        run([py, "-m", "parallelwavegan_tpu.bin.compute_statistics",
             "--config", args.config, "--rootdir", os.path.join(dump, "raw"),
             "--dumpdir", dump, "--verbose", "1"])
        run([py, "-m", "parallelwavegan_tpu.bin.normalize",
             "--config", args.config, "--rootdir", os.path.join(dump, "raw"),
             "--dumpdir", os.path.join(dump, "norm"),
             "--stats", os.path.join(dump, "stats.h5"), "--verbose", "1"])

    # throughput-run config: fixed step budget, no eval/save pauses, and
    # the full G+D regime from step 0 (the heaviest phase — reference
    # configs delay D by 100k steps; measuring G+D is the conservative
    # per-step comparison)
    bench_conf = dict(config)
    bench_conf.update(
        train_max_steps=args.steps,
        log_interval_steps=args.log_interval,
        eval_interval_steps=10 ** 9,
        save_interval_steps=10 ** 9,
        generator_train_start_steps=0,
        discriminator_train_start_steps=0,
    )
    conf_path = os.path.join(args.workdir, f"{name}.bench.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump(bench_conf, f)

    outdir = os.path.join(args.workdir, f"exp_{name}")
    shutil.rmtree(outdir, ignore_errors=True)
    proc = subprocess.run(
        [py, "-m", "parallelwavegan_tpu.bin.train",
         "--config", conf_path,
         "--train-dumpdir", os.path.join(dump, "norm"),
         "--dev-dumpdir", os.path.join(dump, "norm"),
         "--outdir", outdir, "--verbose", "1"],
        capture_output=True, text=True,
    )
    log = proc.stdout + proc.stderr
    sys.stderr.write(log[-2000:])
    if proc.returncode != 0:
        raise SystemExit(f"train failed rc={proc.returncode}")

    rates = [float(m) for m in re.findall(
        r"train/steps_per_sec = ([0-9]+\.[0-9]+)", log)]
    if not rates:
        raise SystemExit("no steps_per_sec lines in the train log")
    # steady state: drop the first interval (compile) and average the rest
    steady = rates[1:] or rates
    sps = float(np.median(steady))
    samples = sps * config["batch_size"] * config["batch_max_steps"]
    print(json.dumps({
        "config": name,
        "steps_per_sec": round(sps, 3),
        "samples_per_sec": round(samples),
        "all_intervals": [round(r, 2) for r in rates],
    }))


if __name__ == "__main__":
    main()
