"""Jitted GAN train/eval steps.

Behavioral reference: the eager hot loop
/root/reference/parallel_wavegan/bin/train.py:189-340 (G phase: aux losses
x lambda_aux + adv + feat-match, clip, step, sched; D phase: optional
re-run of G with updated weights, real/fake loss, step) and the eval loop
:370-507.

TPU design: the whole G+D step — both forwards, all losses, both optimizer
updates — is ONE compiled XLA program with donated state. The reference's
step-dependent phase gating (generator_train_start_steps /
discriminator_train_start_steps, train.py:200,265,300) selects between a
few pre-built jit variants host-side, so no recompilation and no traced
branching on the hot path. Loss scalars come back as a metrics dict.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from parallelwavegan_tpu.train.criterion import Criterion
from parallelwavegan_tpu.train.state import TrainState


def make_generator_forward(config: dict, generator) -> Callable:
    """(params_g, vars_g, batch, rng, train) -> model output(s).

    Maps the generator family to its input signature, mirroring the
    reference's feature flags (train.py:1109-1117).
    """
    gen_type = config["generator_type"]

    def forward(params_g, vars_g, batch, rng, train):
        variables = {"params": params_g, **vars_g}
        rng_noise, rng_drop = jax.random.split(rng)
        rngs = {"noise": rng_noise, "dropout": rng_drop}
        if gen_type in ("ParallelWaveGANGenerator",):
            return generator.apply(
                variables, batch["z"], batch["c"], deterministic=not train,
                rngs=rngs,
            )
        if gen_type in ("StyleMelGANGenerator",):
            # optional explicit z (B, 1, in_channels): the cross-trainer A/B
            # pins the reference's internal torch.randn draw with it
            return generator.apply(variables, batch["c"], batch.get("z"),
                                   rngs=rngs)
        if gen_type in ("UHiFiGANGenerator",):
            return generator.apply(
                variables,
                batch["excitation"],
                batch["c"],
                deterministic=not train,
                rngs=rngs,
            )
        if gen_type == "DiscreteSymbolStyleMelGANGenerator":
            return generator.apply(variables, batch["c"], rngs=rngs)
        if gen_type == "DiscreteSymbolHiFiGANGenerator":
            return generator.apply(variables, batch["c"])
        if gen_type == "DiscreteSymbolDurationGenerator":
            # teacher-forced expansion length: total durations per sample
            # equal the cropped frame count (y length / upsample factor)
            factor = 1
            for s in config["generator_params"].get(
                "upsample_scales", (8, 8, 2, 2)
            ):
                factor *= s
            out_length = batch["y"].shape[1] // factor
            return generator.apply(
                variables, batch["c"], batch["ds"], out_length,
                deterministic=not train, rngs=rngs,
            )
        if gen_type == "VQVAE":
            return generator.apply(
                variables,
                batch["y_in"],
                batch.get("local"),
                batch.get("global"),
            )
        # MelGAN / HiFiGAN and other mel2wav generators
        return generator.apply(variables, batch["c"])

    return forward


def make_discriminator_forward(config: dict, discriminator) -> Callable:
    """(params_d, vars_d, x, rng, update_vars) -> (outputs, new_vars_d)."""
    dis_type = config["discriminator_type"]

    def forward(params_d, vars_d, x, rng, update_vars, starts=None):
        variables = {"params": params_d, **vars_d}
        rngs = {"rwd": rng} if dis_type == "StyleMelGANDiscriminator" else None
        mutable = list(vars_d.keys()) if (update_vars and vars_d) else False
        if dis_type == "StyleMelGANDiscriminator" and starts is not None:
            # deterministic random-window offsets (cross-trainer A/B)
            out = discriminator.apply(
                variables, x, starts, rngs=rngs, mutable=mutable
            )
        else:
            out = discriminator.apply(variables, x, rngs=rngs, mutable=mutable)
        if mutable:
            return out[0], out[1]
        return out, vars_d

    return forward


def _squeeze_wave(y):
    """(B, T, 1) -> (B, T) for the waveform-domain losses."""
    return y[..., 0] if y.ndim == 3 and y.shape[-1] == 1 else y


def _with_vq_input(batch: dict, config: dict, criterion: Criterion) -> dict:
    """VQVAE encoder input: raw audio, or its PQMF subbands (train.py:205-211)."""
    if config["generator_params"].get("in_channels", 1) == 1:
        y_in = batch["y"]
    else:
        y_in = criterion.pqmf.analysis(batch["y"])
    return {**batch, "y_in": y_in}


def _generator_losses(criterion: Criterion, config, y_, y, metrics):
    """Aux (stft/subband/mel) losses; returns (aux_total, y_full, y_mb_)."""
    gen_loss = 0.0
    y_mb_ = None
    if config["generator_params"].get("out_channels", 1) > 1:
        y_mb_ = y_
        y_ = criterion.pqmf.synthesis(y_mb_)
    yf_, yf = _squeeze_wave(y_), _squeeze_wave(y)
    if criterion.use_stft_loss:
        sc_loss, mag_loss = criterion.stft(yf_, yf)
        gen_loss += sc_loss + mag_loss
        metrics["spectral_convergence_loss"] = sc_loss
        metrics["log_stft_magnitude_loss"] = mag_loss
    if criterion.use_subband_stft_loss:
        gen_loss *= 0.5  # balance with subband stft loss (train.py:242-247)
        y_mb = criterion.pqmf.analysis(y)
        sub_sc, sub_mag = criterion.sub_stft(y_mb_, y_mb)
        gen_loss += 0.5 * (sub_sc + sub_mag)
        metrics["sub_spectral_convergence_loss"] = sub_sc
        metrics["sub_log_stft_magnitude_loss"] = sub_mag
    if criterion.use_mel_loss:
        mel_loss = criterion.mel(yf_, yf)
        gen_loss += mel_loss
        metrics["mel_loss"] = mel_loss
    return gen_loss, y_, y_mb_


def build_train_step(
    config: dict,
    generator,
    discriminator,
    criterion: Criterion,
    opt_g_tx: optax.GradientTransformation,
    opt_d_tx: optax.GradientTransformation,
    *,
    train_g: bool,
    train_d: bool,
    donate: bool = True,
    increment_steps: bool = True,
):
    """Build one (state, batch, rng) -> (state, metrics) train-step variant.

    The default reference semantics (G update, then D on fakes from the
    *updated* generator) run as TWO jitted programs invoked back to back:
    chaining update->re-forward->second update inside one XLA program
    triggers a catastrophic scheduling/memory pathology on TPU (~2500x
    slower than the phases run separately — measured 14.6 s vs 5+6 ms per
    step for HiFi-GAN V1). Each sub-program donates its input state, so
    nothing extra moves through HBM. With
    ``update_prediction_after_generator_update: false`` the G-phase fakes
    feed D directly and a single fused program is used.
    """
    gen_forward = make_generator_forward(config, generator)
    dis_forward = make_discriminator_forward(config, discriminator)
    update_prediction = config.get("update_prediction_after_generator_update", True)
    is_vq = config.get("generator_type") == "VQVAE"
    use_duration = config.get("generator_type") == "DiscreteSymbolDurationGenerator"
    # mixed_precision: true -> model forwards/backwards run in bf16
    # (params cast at use, activations bf16, halved HBM traffic) while the
    # master params, optimizer state, losses and non-param variables
    # (spectral-norm u/v) stay float32. bf16 has f32's exponent range, so
    # no loss scaling is needed. The cast is differentiable: grads arrive
    # back in f32 for the optax update.
    mixed = bool(config.get("mixed_precision", False))

    def _bf16(tree):
        if not mixed:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def _f32(tree):
        if not mixed:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
            tree,
        )

    if train_g and train_d and update_prediction:
        g_step = build_train_step(
            config, generator, discriminator, criterion, opt_g_tx, opt_d_tx,
            train_g=True, train_d=False, donate=donate, increment_steps=False,
        )
        # train_g=False re-runs G (with the just-updated params) for fresh
        # fakes inside the D program — reference train.py:300-315 semantics
        d_step = build_train_step(
            config, generator, discriminator, criterion, opt_g_tx, opt_d_tx,
            train_g=False, train_d=True, donate=donate, increment_steps=True,
        )

        def combined(state: TrainState, batch: dict, rng):
            rng_g, rng_d = jax.random.split(rng)
            state, m_g = g_step(state, batch, rng_g)
            state, m_d = d_step(state, batch, rng_d)
            return state, {**m_g, **m_d}

        return combined

    # the G-only sub-program must still report the adversarial terms the
    # reference logs during the G phase, so train_d-gated losses key off
    # whether a discriminator phase exists at all this step
    g_sees_d = train_d or (not increment_steps)

    def step(state: TrainState, batch: dict, rng) -> tuple[TrainState, dict]:
        metrics = {}
        rng_g, rng_gd, rng_dre, rng_dr, rng_df = jax.random.split(rng, 5)
        params_g, opt_g = state.params_g, state.opt_g
        params_d, opt_d = state.params_d, state.opt_d
        vars_d = state.vars_d
        y = batch["y"]
        if is_vq:
            batch = _with_vq_input(batch, config, criterion)

        if train_g:

            def g_loss_fn(p_g):
                m = {}
                p_gc, batch_c = _bf16(p_g), _bf16(batch)
                if is_vq:
                    y_, z_e, z_q = _f32(gen_forward(
                        p_gc, state.vars_g, batch_c, rng_g, True
                    ))
                    quantize_loss = jnp.mean(
                        (z_q - jax.lax.stop_gradient(z_e)) ** 2
                    )
                    commit_loss = jnp.mean(
                        (z_e - jax.lax.stop_gradient(z_q)) ** 2
                    )
                    m["quantization_loss"] = quantize_loss
                    m["commitment_loss"] = commit_loss
                    gen_loss = quantize_loss + criterion.lambda_commit * commit_loss
                elif use_duration:
                    y_, ds_ = _f32(gen_forward(
                        p_gc, state.vars_g, batch_c, rng_g, True
                    ))
                    log_d_target = jnp.log(batch["ds"].astype(jnp.float32) + 1.0)
                    duration_loss = jnp.mean((ds_ - log_d_target) ** 2)
                    m["duration_loss"] = duration_loss
                    gen_loss = duration_loss
                else:
                    y_ = _f32(gen_forward(
                        p_gc, state.vars_g, batch_c, rng_g, True
                    ))
                    gen_loss = 0.0

                aux_loss, y_full, _ = _generator_losses(
                    criterion, config, y_, y, m
                )
                gen_loss = (gen_loss + aux_loss) * criterion.lambda_aux

                vars_d_after = vars_d
                if g_sees_d:
                    # update_vars=True: torch runs the spectral-norm power
                    # iteration on EVERY train-mode D forward, including
                    # these G-phase passes (train.py:265-276) — the updated
                    # (u, v) estimates are threaded out through the aux
                    p_, vars_d_after = dis_forward(
                        _bf16(params_d), vars_d, _bf16(y_full), rng_gd, True,
                        batch.get("rwd_starts_adv"),
                    )
                    p_ = _f32(p_)
                    adv_loss = criterion.gen_adv(p_)
                    m["adversarial_loss"] = adv_loss
                    if criterion.use_feat_match_loss:
                        p, vars_d_after = dis_forward(
                            _bf16(params_d), vars_d_after, _bf16(y),
                            rng_gd, True, batch.get("rwd_starts_fm"),
                        )
                        p = _f32(p)
                        fm_loss = criterion.feat_match(p_, p)
                        m["feature_matching_loss"] = fm_loss
                        adv_loss = adv_loss + criterion.lambda_feat_match * fm_loss
                    gen_loss = gen_loss + criterion.lambda_adv * adv_loss
                m["generator_loss"] = gen_loss
                return gen_loss, (m, y_full, vars_d_after)

            (_, (g_metrics, y_gen, vars_d)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(params_g)
            updates, opt_g = opt_g_tx.update(grads, opt_g, params_g)
            params_g = optax.apply_updates(params_g, updates)
            metrics.update(g_metrics)
            y_ = jax.lax.stop_gradient(y_gen)  # pre-update fakes (reused
            # for D when update_prediction_after_generator_update=false)

        if train_d:
            # fresh fakes from the just-updated generator (train.py:300-315);
            # with the option off and G untrained this still runs G once
            if update_prediction or not train_g:
                p_gc, batch_c = _bf16(params_g), _bf16(batch)
                if is_vq:
                    y_, _, _ = gen_forward(
                        p_gc, state.vars_g, batch_c, rng_dre, False
                    )
                elif use_duration:
                    y_, _ = gen_forward(
                        p_gc, state.vars_g, batch_c, rng_dre, False
                    )
                else:
                    y_ = gen_forward(p_gc, state.vars_g, batch_c, rng_dre, False)
                y_ = _f32(y_)
                if config["generator_params"].get("out_channels", 1) > 1:
                    y_ = criterion.pqmf.synthesis(y_)
                y_ = jax.lax.stop_gradient(y_)

            def d_loss_fn(p_d):
                p_dc = _bf16(p_d)
                p, vars1 = dis_forward(p_dc, vars_d, _bf16(y), rng_dr, True,
                                       batch.get("rwd_starts_real"))
                p_, vars2 = dis_forward(p_dc, vars1, _bf16(y_), rng_df, True,
                                        batch.get("rwd_starts_fake"))
                real_loss, fake_loss = criterion.dis_adv(_f32(p_), _f32(p))
                dis_loss = real_loss + fake_loss
                return dis_loss, (real_loss, fake_loss, vars2)

            (dis_loss, (real_loss, fake_loss, new_vars_d)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(params_d)
            )
            d_updates, opt_d = opt_d_tx.update(d_grads, opt_d, params_d)
            params_d = optax.apply_updates(params_d, d_updates)
            vars_d = new_vars_d
            metrics["real_loss"] = real_loss
            metrics["fake_loss"] = fake_loss
            metrics["discriminator_loss"] = dis_loss

        new_state = state.replace(
            steps=state.steps + (1 if increment_steps else 0),
            params_g=params_g,
            params_d=params_d,
            opt_g=opt_g,
            opt_d=opt_d,
            vars_d=vars_d,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_eval_step(config, generator, discriminator, criterion: Criterion):
    """Jitted eval step: all losses, no updates (train.py:370-507)."""
    gen_forward = make_generator_forward(config, generator)
    dis_forward = make_discriminator_forward(config, discriminator)
    is_vq = config.get("generator_type") == "VQVAE"
    use_duration = config.get("generator_type") == "DiscreteSymbolDurationGenerator"

    @jax.jit
    def step(state: TrainState, batch: dict, rng) -> dict:
        metrics = {}
        rng_g, rng_d = jax.random.split(rng)
        y = batch["y"]
        if is_vq:
            batch = _with_vq_input(batch, config, criterion)
        if is_vq:
            y_, z_e, z_q = gen_forward(
                state.params_g, state.vars_g, batch, rng_g, False
            )
            metrics["quantization_loss"] = jnp.mean(
                (z_q - jax.lax.stop_gradient(z_e)) ** 2
            )
            metrics["commitment_loss"] = jnp.mean(
                (z_e - jax.lax.stop_gradient(z_q)) ** 2
            )
            gen_loss = (
                metrics["quantization_loss"]
                + criterion.lambda_commit * metrics["commitment_loss"]
            )
        elif use_duration:
            y_, ds_ = gen_forward(state.params_g, state.vars_g, batch, rng_g, False)
            log_d_target = jnp.log(batch["ds"].astype(jnp.float32) + 1.0)
            metrics["duration_loss"] = jnp.mean((ds_ - log_d_target) ** 2)
            gen_loss = metrics["duration_loss"]
        else:
            y_ = gen_forward(state.params_g, state.vars_g, batch, rng_g, False)
            gen_loss = 0.0

        aux_loss, y_full, _ = _generator_losses(criterion, config, y_, y, metrics)
        gen_loss = (gen_loss + aux_loss) * criterion.lambda_aux

        p_, _ = dis_forward(state.params_d, state.vars_d, y_full, rng_d, False)
        p, _ = dis_forward(state.params_d, state.vars_d, y, rng_d, False)
        adv_loss = criterion.gen_adv(p_)
        metrics["adversarial_loss"] = adv_loss
        if criterion.use_feat_match_loss:
            fm_loss = criterion.feat_match(p_, p)
            metrics["feature_matching_loss"] = fm_loss
            adv_loss = adv_loss + criterion.lambda_feat_match * fm_loss
        gen_loss = gen_loss + criterion.lambda_adv * adv_loss
        metrics["generator_loss"] = gen_loss

        real_loss, fake_loss = criterion.dis_adv(p_, p)
        metrics["real_loss"] = real_loss
        metrics["fake_loss"] = fake_loss
        metrics["discriminator_loss"] = real_loss + fake_loss
        return metrics

    return step
