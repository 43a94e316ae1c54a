"""Steps-driven GAN trainer.

Behavioral reference: /root/reference/parallel_wavegan/bin/train.py:49-643
(steps- not epoch-driven loop; per-interval averaged scalar logging to
TensorBoard; eval pass over the dev set with waveform/figure dumps of the
first batch; checkpoint save every save_interval_steps and on exit).

TPU design: the trainer is a thin host loop around the jitted step
variants from step.py. Phase gating picks a variant host-side; batches are
device_put asynchronously (the thread-prefetched loader overlaps IO);
metrics transfer happens only at log intervals to keep the device queue
full.
"""

from __future__ import annotations

import itertools
import logging
import os
import time
from collections import defaultdict

import jax
import numpy as np

from parallelwavegan_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from parallelwavegan_tpu.train.criterion import Criterion
from parallelwavegan_tpu.train.state import TrainState
from parallelwavegan_tpu.train.step import (
    build_eval_step,
    build_train_step,
    make_generator_forward,
)
from parallelwavegan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


class Trainer:
    """Config-driven GAN training loop over jitted steps."""

    def __init__(
        self,
        config: dict,
        state: TrainState,
        generator,
        discriminator,
        criterion: Criterion,
        opt_g_tx,
        opt_d_tx,
        train_loader,
        dev_loader=None,
        outdir: str = "exp",
        writer=None,
        mesh=None,
    ):
        self.config = config
        self.generator = generator
        self.discriminator = discriminator
        self.criterion = criterion
        self.train_loader = train_loader
        self.dev_loader = dev_loader
        self.outdir = outdir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.state = shard_state(state, self.mesh)
        self.steps = int(jax.device_get(state.steps))
        self.epochs = 0
        self.finish_train = False
        self.is_rank0 = jax.process_index() == 0

        self._step_variants = {}
        for train_g in (False, True):
            for train_d in (False, True):
                if not train_g and not train_d:
                    continue
                self._step_variants[(train_g, train_d)] = build_train_step(
                    config,
                    generator,
                    discriminator,
                    criterion,
                    opt_g_tx,
                    opt_d_tx,
                    train_g=train_g,
                    train_d=train_d,
                )
        self._eval_step = build_eval_step(
            config, generator, discriminator, criterion
        )
        self._gen_forward = jax.jit(
            make_generator_forward(config, generator), static_argnums=(4,)
        )

        self.writer = writer
        if self.writer is None and self.is_rank0:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(outdir)
            except ImportError:  # pragma: no cover
                self.writer = None

        self.total_train_loss = defaultdict(float)
        self._pending_metrics: list = []
        self._rng = jax.random.key(config.get("seed", 0) + jax.process_index())
        self._last_log_time = time.time()

    # ------------------------------------------------------------------
    def run(self):
        """Train until train_max_steps, checkpointing on exit.

        SIGTERM (the signal `timeout`, cluster schedulers, and TPU
        preemptions deliver) requests a graceful stop so the
        finally-save below still runs — mirroring the reference's
        crash-resilience contract (train.py:1540-1546) under preemption,
        not just Ctrl-C. The handler only SETS A FLAG checked at step
        granularity: raising KeyboardInterrupt from the handler is
        silently dropped whenever the signal lands while the main thread
        is inside a jaxlib nanobind call (device_put / execute — i.e.
        most of every step; observed on this stack round 5), which made
        preemption handling a coin flip.
        """
        import signal

        self._preempted = False

        def _term(signum, frame):
            self._preempted = True

        try:
            prev_term = signal.signal(signal.SIGTERM, _term)
        except ValueError:  # non-main thread
            prev_term = None
        self.tick = time.time()
        try:
            for batch in self.train_loader:
                self._check_profile_window()
                self._train_step(batch)
                if self.is_rank0:
                    self._check_log_interval()
                # eval computes over the global mesh -> EVERY process must
                # enter (side effects inside are rank-0-gated); running it
                # on rank 0 alone desyncs the collectives
                self._check_eval_interval()
                if self.is_rank0:
                    self._check_save_interval()
                if self.finish_train:
                    break
                if self._preempted:
                    logging.info(
                        "SIGTERM received: stopping at step %d "
                        "(checkpoint follows).", self.steps)
                    break
        finally:
            if prev_term is not None:
                import signal

                signal.signal(signal.SIGTERM, prev_term)
            if self.is_rank0:
                self.save_checkpoint(
                    os.path.join(
                        self.outdir, f"checkpoint-{self.steps}steps.pkl"
                    )
                )
        logging.info("Finished training (%d steps).", self.steps)

    # ------------------------------------------------------------------
    def _check_profile_window(self):
        """Capture a jax.profiler trace over a step window.

        SURVEY.md §5: the reference has no tracing beyond decode RTF; the
        TPU-native equivalent is an XProf/TensorBoard trace. Enabled by
        config key ``profile_steps: [start, stop]`` (written by the train
        CLI's --profile flag); the trace lands in <outdir>/profile.
        """
        window = self.config.get("profile_steps")
        if not window or not self.is_rank0:
            return
        start, stop = int(window[0]), int(window[1])
        if self.steps == start and not getattr(self, "_profiling", False):
            jax.block_until_ready(self.state.params_g)
            jax.profiler.start_trace(os.path.join(self.outdir, "profile"))
            self._profiling = True
            logging.info("profiler: trace started at step %d", self.steps)
        elif self.steps >= stop and getattr(self, "_profiling", False):
            self._drain_metrics()  # flush pending transfers into the trace
            jax.profiler.stop_trace()
            self._profiling = False
            logging.info(
                "profiler: trace written to %s (view with tensorboard "
                "--logdir or xprof)", os.path.join(self.outdir, "profile"),
            )

    def _phase_flags(self) -> tuple[bool, bool]:
        train_g = self.steps > self.config.get("generator_train_start_steps", 0)
        train_d = self.steps > self.config.get("discriminator_train_start_steps", 0)
        if not train_g and not train_d:
            # nothing trains this step in the reference either; run G-only
            # so the step counter and data stream advance identically
            return True, False
        return train_g, train_d

    def _train_step(self, batch):
        train_g, train_d = self._phase_flags()
        step_fn = self._step_variants[(train_g, train_d)]
        batch = shard_batch(batch, self.mesh)
        self._rng, rng = jax.random.split(self._rng)
        self.state, metrics = step_fn(self.state, batch, rng)
        if self.is_rank0:  # other ranks never drain; don't accumulate
            self._pending_metrics.append(metrics)
        self.steps += 1
        if self.steps >= self.config["train_max_steps"]:
            self.finish_train = True

    def _drain_metrics(self):
        """Host-transfer accumulated step metrics (batched for async)."""
        if not self._pending_metrics:
            return
        got = jax.device_get(self._pending_metrics)
        self._pending_metrics = []
        for m in got:
            for k, v in m.items():
                self.total_train_loss[f"train/{k}"] += float(v)

    # ------------------------------------------------------------------
    def _check_log_interval(self):
        interval = self.config.get("log_interval_steps", 100)
        if self.steps % interval != 0 or self.steps == 0:
            return
        self._drain_metrics()
        elapsed = time.time() - self._last_log_time
        steps_per_sec = interval / max(elapsed, 1e-9)
        self._last_log_time = time.time()
        for key in sorted(self.total_train_loss):
            value = self.total_train_loss[key] / interval
            logging.info(
                "(Steps: %d) %s = %.4f.", self.steps, key, value
            )
            if self.writer is not None:
                self.writer.add_scalar(key, value, self.steps)
        if self.writer is not None:
            self.writer.add_scalar("train/steps_per_sec", steps_per_sec, self.steps)
        logging.info(
            "(Steps: %d) train/steps_per_sec = %.3f.", self.steps, steps_per_sec
        )
        self.total_train_loss = defaultdict(float)

    # ------------------------------------------------------------------
    def _check_eval_interval(self):
        interval = self.config.get("eval_interval_steps", 1000)
        if self.steps % interval != 0 or self.steps == 0:
            return
        if self.dev_loader is None:
            return
        # every process iterates the SAME number of batches so the global
        # collectives inside eval_step stay in lockstep
        limit = self.dev_loader.min_batches_across_shards
        if limit == 0:
            if self.is_rank0 and not getattr(self, "_warned_no_eval", False):
                self._warned_no_eval = True
                logging.warning(
                    "(Steps: %d) dev set too small for one batch per host "
                    "(need >= num_hosts * batch_size/num_hosts usable "
                    "utterances); evaluation is SKIPPED for this run.",
                    self.steps,
                )
            return
        if self.is_rank0:
            logging.info("(Steps: %d) Start evaluation.", self.steps)
        totals = defaultdict(float)
        n_batches = 0
        first_batch = None
        for batch in itertools.islice(
            self.dev_loader.epoch_batches(0), limit
        ):
            if first_batch is None:
                first_batch = batch
            # fresh key per dev batch: noise-input generators (PWG z,
            # StyleMelGAN) and the random-window D must not see identical
            # randomness every batch or eval-loss variance is understated
            self._rng, rng = jax.random.split(self._rng)
            m = self._eval_step(
                self.state, shard_batch(batch, self.mesh), rng
            )
            m = jax.device_get(m)
            for k, v in m.items():
                totals[f"eval/{k}"] += float(v)
            n_batches += 1
        if not self.is_rank0:
            return
        for key in sorted(totals):
            value = totals[key] / max(n_batches, 1)
            logging.info("(Steps: %d) %s = %.4f.", self.steps, key, value)
            if self.writer is not None:
                self.writer.add_scalar(key, value, self.steps)
        if first_batch is not None:
            try:
                self._generate_and_save_intermediate_result(first_batch)
            except Exception:  # pragma: no cover - plotting must not kill training
                logging.exception("intermediate result generation failed")
        logging.info(
            "(Steps: %d) Finished evaluation (%d batches).", self.steps, n_batches
        )

    def _generate_and_save_intermediate_result(self, batch):
        """Dump ref/gen waveform plots + wavs for a few dev items."""
        from parallelwavegan_tpu.utils.io import write_wav

        n = self.config.get("num_save_intermediate_results", 4)
        dirname = os.path.join(self.outdir, "predictions", f"{self.steps}steps")
        os.makedirs(dirname, exist_ok=True)
        small = {
            k: v[:n] for k, v in batch.items()
        }
        self._rng, rng = jax.random.split(self._rng)
        params_g, vars_g = self.state.params_g, self.state.vars_g
        if jax.process_count() > 1:
            # the dump forward runs on THIS host only: detach the params
            # from their global-mesh sharding so the jit stays local
            params_g, vars_g = jax.device_get((params_g, vars_g))
        if not hasattr(self, "_jit_dump_forward"):
            # eager dispatch of a deep generator through the device tunnel
            # costs minutes; the dump shape is the fixed eval-crop shape,
            # so one jitted program serves every interval
            self._jit_dump_forward = jax.jit(
                lambda p, v, b, r: self._gen_forward(p, v, b, r, False)
            )
        y_ = self._jit_dump_forward(
            params_g, vars_g, shard_batch_to_host(small), rng
        )
        if self.config["generator_params"].get("out_channels", 1) > 1:
            y_ = self.criterion.pqmf.synthesis(y_)
        y_ = np.asarray(jax.device_get(y_))
        y = small["y"]
        fs = self.config["sampling_rate"]
        have_mpl = True
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            have_mpl = False
        for idx in range(min(n, y_.shape[0])):
            ref = y[idx, :, 0]
            gen = y_[idx, :, 0]
            write_wav(os.path.join(dirname, f"{idx}_ref.wav"), fs, ref)
            write_wav(os.path.join(dirname, f"{idx}_gen.wav"), fs, gen)
            if have_mpl:
                fig = plt.figure(figsize=(6, 4))
                for i, (sig, title) in enumerate(
                    [(ref, "groundtruth speech"), (gen, "generated speech")], 1
                ):
                    ax = fig.add_subplot(2, 1, i)
                    ax.plot(sig)
                    ax.set_title(f"{title} @ {self.steps} steps")
                fig.tight_layout()
                fig.savefig(os.path.join(dirname, f"{idx}.png"))
                plt.close(fig)

    # ------------------------------------------------------------------
    def _check_save_interval(self):
        interval = self.config.get("save_interval_steps", 10000)
        if self.steps % interval != 0 or self.steps == 0:
            return
        self.save_checkpoint(
            os.path.join(self.outdir, f"checkpoint-{self.steps}steps.pkl")
        )
        logging.info("Saved checkpoint @ %d steps.", self.steps)

    def save_checkpoint(self, path: str):
        self._drain_metrics()
        save_checkpoint(path, jax.device_get(self.state), epochs=self.epochs)

    def load_checkpoint(self, path: str, load_only_params: bool = False):
        state, epochs = load_checkpoint(
            path, jax.device_get(self.state), load_only_params
        )
        self.state = shard_state(state, self.mesh)
        self.epochs = epochs
        self.steps = int(np.asarray(state.steps))


def shard_batch_to_host(batch: dict) -> dict:
    """Numpy batch -> jnp without mesh placement (small eval-side helper)."""
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()}
