#!/usr/bin/env python3
"""Cross-trainer loss-trajectory A/B vs the reference torch trainer.

Runs the reference's OWN ``Trainer._train_step``
(/root/reference/parallel_wavegan/bin/train.py:189-340) side by side with
this framework's jitted train step on identical data:

  * both sides start from the SAME weights — the torch modules are
    initialized first and their state dicts are translated with
    ``convert.torch_checkpoint.convert_state_dict`` (weight-norm g/v and
    spectral-norm u included, so the optimizer geometry matches too);
  * both sides consume identical pre-generated batches (synthetic speech:
    harmonic mixtures + our log-mel extractor), bypassing both collaters'
    RNG;
  * both phases (G and D) run from the first step
    (generator/discriminator_train_start_steps forced to 0, the torch
    trainer is started at steps=1 to clear its strict ``steps > start``
    gating);
  * everything is float32 on CPU (JAX_PLATFORMS=cpu,
    jax_default_matmul_precision=highest) so the only differences are
    implementation numerics, not hardware rounding.

hifigan / pwg / mb_melgan / vqvae are deterministic given the batch —
no dropout, no noise sampling inside the step — so per-step G/D losses
are directly comparable. style_melgan samples noise and random D windows;
both draws are pinned to shared values on the two sides (z fed explicitly,
torch's np.random.randint monkeypatched to our precomputed indices).

Spectral-norm schedule: with ``follow_official_norm`` the first
HiFi-GAN scale discriminator carries spectral norm, and torch runs its
power iteration on EVERY train-mode forward (4x/step: two passes in the
G phase + two in the D phase). Our step matches this exactly — the
G-phase D forwards thread the updated ``(u, v)`` estimates out through
the loss aux (train/step.py:271-291) so the D phase starts from the
same power-iteration state torch would have.

Dependency shims: ``soundfile`` (unused on this path) is stubbed, and
``librosa.filters.mel`` is backed by our own Slaney filterbank
(ops/mel.py) — i.e. the A/B pins the *trainer/loss/optimizer dynamics*,
not librosa's filterbank tables (those are pinned by construction in
ops/mel.py).

Usage:
  python benchmarks/ab_reference_trainer.py \
      [--families hifigan,pwg,mb_melgan,style_melgan,vqvae]
      [--steps 100] [--out docs/TRAINER_AB.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONF = os.path.join(REPO, "egs", "yesno", "voc1", "conf")

FAMILY_CONFIGS = {
    "hifigan": "hifigan.v1.debug.yaml",
    "pwg": "parallel_wavegan.v1.debug.yaml",
    "mb_melgan": "multi_band_melgan.v1.debug.yaml",
    # r4 additions (VERDICT r3 #4): StyleMelGAN with pinned noise + random
    # windows, VQ-VAE via the converted-init protocol
    "style_melgan": "style_melgan.v1.debug.yaml",
    "vqvae": "../../vq1/conf/melgan_vae.v3.debug.yaml",
}

# ours -> reference total_train_loss key (train.py:232-325)
LOSS_KEYS = {
    "quantization_loss": "train/quantization_loss",
    "commitment_loss": "train/commitment_loss",
    "spectral_convergence_loss": "train/spectral_convergence_loss",
    "log_stft_magnitude_loss": "train/log_stft_magnitude_loss",
    "sub_spectral_convergence_loss": "train/sub_spectral_convergence_loss",
    "sub_log_stft_magnitude_loss": "train/sub_log_stft_magnitude_loss",
    "mel_loss": "train/mel_loss",
    "adversarial_loss": "train/adversarial_loss",
    "feature_matching_loss": "train/feature_matching_loss",
    "generator_loss": "train/generator_loss",
    "real_loss": "train/real_loss",
    "fake_loss": "train/fake_loss",
    "discriminator_loss": "train/discriminator_loss",
}


def _install_reference_shims():
    """Make /root/reference importable without soundfile/librosa."""
    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")
        sf.write = lambda *a, **k: None
        sf.read = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
        sys.modules["soundfile"] = sf
    if "kaldiio" not in sys.modules:
        # only the reference SCP datasets touch kaldiio; this A/B feeds
        # batches directly, so a bare namespace is enough to import train.py
        kio = types.ModuleType("kaldiio")
        kio.load_scp = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("stub"))
        kio.ReadHelper = None
        sys.modules["kaldiio"] = kio
    if "librosa" not in sys.modules:
        from parallelwavegan_tpu.ops.mel import mel_filterbank

        filters = types.ModuleType("librosa.filters")

        def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

        filters.mel = mel
        librosa = types.ModuleType("librosa")
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # scipy >= 1.13 moved kaiser; the reference PQMF imports the old name
    import scipy.signal
    import scipy.signal.windows as _w

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = _w.kaiser


def load_config(family: str) -> dict:
    import yaml

    with open(os.path.join(CONF, FAMILY_CONFIGS[family])) as f:
        config = yaml.safe_load(f)
    # train both phases from the very first step, run nothing interval-driven
    config.update(
        generator_train_start_steps=0,
        discriminator_train_start_steps=0,
        distributed=False,
        rank=0,
        log_interval_steps=10**9,
        eval_interval_steps=10**9,
        save_interval_steps=10**9,
        train_max_steps=10**9,
    )
    return config


def make_batches(config: dict, n_steps: int, batch_size: int, frames: int,
                 seed: int):
    """Deterministic synthetic-speech batches shared by both trainers.

    StyleMelGAN batches additionally pin the step's remaining random
    draws so both trainers compute the same update:
      * ``z`` (B, 1, in_channels): the generator's internal noise. The
        torch side receives it positionally (forward(c, z),
        style_melgan.py:124-139) — this also pins the D-phase re-run to
        the same z on both sides.
      * ``rwd_starts_{adv,real,fake}``: the D's random-window offsets in
        torch draw order (G-phase fake, D-phase real, D-phase fake); the
        torch side replays them via an np.random.randint patch.
    """
    from parallelwavegan_tpu.ops.mel import logmelfilterbank

    rs = np.random.RandomState(seed)
    fs = config["sampling_rate"]
    hop = config["hop_size"]
    mels = config["num_mels"]
    fft = config["fft_size"]
    win = config["win_length"]
    gtype = config["generator_type"]
    if gtype == "StyleMelGANGenerator":
        # mel length must equal the noise upsample factor in training
        frames = int(np.prod(
            config["generator_params"].get(
                "noise_upsample_scales", (11, 2, 2, 2))))
    t = frames * hop
    batches = []
    for _ in range(n_steps):
        ys, cs = [], []
        for _b in range(batch_size):
            f0 = rs.uniform(80.0, 250.0)
            n = np.arange(t) / fs
            y = sum(
                rs.uniform(0.05, 0.3) * np.sin(2 * np.pi * f0 * (h + 1) * n)
                for h in range(4)
            )
            y = (y + 0.01 * rs.randn(t)).astype(np.float32)
            c = logmelfilterbank(
                y, fs, fft_size=fft, hop_size=hop, win_length=win,
                num_mels=mels, fmin=config.get("fmin"),
                fmax=config.get("fmax"),
            )[:frames].astype(np.float32)
            ys.append(y)
            cs.append(c)
        b = {"y": np.stack(ys)[..., None], "c": np.stack(cs)}
        if gtype == "ParallelWaveGANGenerator":
            w = config["generator_params"].get("aux_context_window", 2)
            b["c"] = np.pad(b["c"], ((0, 0), (w, w), (0, 0)), mode="edge")
            b["z"] = rs.randn(batch_size, t, 1).astype(np.float32)
        if gtype == "StyleMelGANGenerator":
            up = int(np.prod(config["generator_params"].get(
                "upsample_scales", (2,) * 8 + (1,))))
            assert frames * up == t, "hop_size must equal upsample factor"
            in_ch = config["generator_params"].get("in_channels", 128)
            b["z"] = rs.randn(batch_size, 1, in_ch).astype(np.float32)
            dp = config.get("discriminator_params", {})
            sizes = list(dp.get("window_sizes", (512, 1024, 2048, 4096)))
            repeats = dp.get("repeats", 2)
            for key in ("rwd_starts_adv", "rwd_starts_real",
                        "rwd_starts_fake"):
                b[key] = np.array(
                    [rs.randint(0, t - ws)
                     for _ in range(repeats) for ws in sizes],
                    dtype=np.int32,
                )
        batches.append(b)
    return batches


def to_torch_batch(config: dict, b: dict):
    import torch

    c = torch.from_numpy(b["c"].transpose(0, 2, 1))  # (B, mels, F)
    y = torch.from_numpy(b["y"].transpose(0, 2, 1))  # (B, 1, T)
    if config["generator_type"] == "ParallelWaveGANGenerator":
        z = torch.from_numpy(b["z"].transpose(0, 2, 1))
        return ((z, c), y)
    if config["generator_type"] == "VQVAE":
        # trainer calls generator(y, *x) — wave-to-wave, no mel input
        return ((), y)
    if config["generator_type"] == "StyleMelGANGenerator":
        z = torch.from_numpy(b["z"].transpose(0, 2, 1))  # (B, in_ch, 1)
        return ((c, z), y)
    return ((c,), y)


def build_torch_trainer(config: dict, outdir: str, seed: int):
    """Reference models/criterion/optimizers exactly as train.py:1340-1500."""
    import torch

    import parallel_wavegan.models
    import parallel_wavegan.optimizers
    from parallel_wavegan.bin.train import Trainer
    from parallel_wavegan.layers import PQMF
    from parallel_wavegan.losses import (
        DiscriminatorAdversarialLoss,
        FeatureMatchLoss,
        GeneratorAdversarialLoss,
        MelSpectrogramLoss,
        MultiResolutionSTFTLoss,
    )

    torch.manual_seed(seed)
    device = torch.device("cpu")
    model = {
        "generator": getattr(
            parallel_wavegan.models, config["generator_type"]
        )(**config["generator_params"]).to(device),
        "discriminator": getattr(
            parallel_wavegan.models, config["discriminator_type"]
        )(**config["discriminator_params"]).to(device),
    }
    criterion = {
        "gen_adv": GeneratorAdversarialLoss(
            **config.get("generator_adv_loss_params", {})
        ),
        "dis_adv": DiscriminatorAdversarialLoss(
            **config.get("discriminator_adv_loss_params", {})
        ),
        "mse": torch.nn.MSELoss(),
    }
    if config.get("use_stft_loss", True):
        config["use_stft_loss"] = True
        criterion["stft"] = MultiResolutionSTFTLoss(
            **config["stft_loss_params"]
        )
    if config.get("use_subband_stft_loss", False):
        criterion["sub_stft"] = MultiResolutionSTFTLoss(
            **config["subband_stft_loss_params"]
        )
    else:
        config["use_subband_stft_loss"] = False
    if config.get("use_feat_match_loss", False):
        criterion["feat_match"] = FeatureMatchLoss(
            **config.get("feat_match_loss_params", {})
        )
    else:
        config["use_feat_match_loss"] = False
    if config.get("use_mel_loss", False):
        criterion["mel"] = MelSpectrogramLoss(
            **(config.get("mel_loss_params") or dict(
                fs=config["sampling_rate"], fft_size=config["fft_size"],
                hop_size=config["hop_size"], win_length=config["win_length"],
                window=config["window"], num_mels=config["num_mels"],
                fmin=config["fmin"], fmax=config["fmax"],
            ))
        )
    else:
        config["use_mel_loss"] = False
    if config["generator_params"]["out_channels"] > 1:
        criterion["pqmf"] = PQMF(
            subbands=config["generator_params"]["out_channels"],
            **config.get("pqmf_params", {}),
        )
    optimizer = {
        k: getattr(
            parallel_wavegan.optimizers,
            config.get(f"{p}_optimizer_type", "RAdam"),
        )(model[k].parameters(), **config[f"{p}_optimizer_params"])
        for k, p in (("generator", "generator"),
                     ("discriminator", "discriminator"))
    }
    import torch.optim.lr_scheduler as lrs

    scheduler = {
        k: getattr(lrs, config.get(f"{p}_scheduler_type", "StepLR"))(
            optimizer=optimizer[k], **config[f"{p}_scheduler_params"]
        )
        for k, p in (("generator", "generator"),
                     ("discriminator", "discriminator"))
    }
    config = dict(config, outdir=outdir)
    trainer = Trainer(
        steps=1,  # strict '>' gating: both phases active from the 1st call
        epochs=0,
        data_loader={},
        sampler={},
        model=model,
        criterion=criterion,
        optimizer=optimizer,
        scheduler=scheduler,
        config=config,
        device=device,
    )

    class _Tqdm:
        def update(self, n):
            pass

    trainer.tqdm = _Tqdm()
    return trainer


def build_jax_runner(config: dict, torch_model):
    """Our step, initialized from the torch modules' translated weights."""
    import jax

    from parallelwavegan_tpu.convert.torch_checkpoint import convert_state_dict
    from parallelwavegan_tpu.models import get_model_class
    from parallelwavegan_tpu.optimizers import build_optimizer_from_config
    from parallelwavegan_tpu.train.criterion import build_criterion
    from parallelwavegan_tpu.train.state import init_train_state
    from parallelwavegan_tpu.train.step import build_train_step

    gen = get_model_class(config["generator_type"])(
        **config["generator_params"]
    )
    dis = get_model_class(config["discriminator_type"])(
        **config["discriminator_params"]
    )

    def np_sd(mod):
        # .copy(): torch's .numpy() shares storage with the live parameter,
        # and the torch optimizer updates in place — without the copy, our
        # "initial" weights would silently track the torch side's updates
        # until the first jit call materializes them on device
        return {k: v.detach().cpu().numpy().copy()
                for k, v in mod.state_dict().items()}

    params_g, extra_g = convert_state_dict(
        config["generator_type"], config["generator_params"],
        np_sd(torch_model["generator"]),
    )
    params_d, extra_d = convert_state_dict(
        config["discriminator_type"], config["discriminator_params"],
        np_sd(torch_model["discriminator"]),
    )
    opt_g = build_optimizer_from_config(config, "generator")
    opt_d = build_optimizer_from_config(config, "discriminator")
    criterion = build_criterion(config)
    state = init_train_state(
        params_g, params_d, opt_g, opt_d,
        vars_g=extra_g or {}, vars_d=extra_d or {},
    )
    state = jax.device_put(state)  # snapshot now, independent of torch
    step = build_train_step(
        config, gen, dis, criterion, opt_g, opt_d,
        train_g=True, train_d=True, donate=False,
    )

    def run_step(state, batch, i):
        jb = {k: jax.numpy.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, jb, jax.random.key(1000 + i))
        return state, {k: float(v) for k, v in metrics.items()}

    return state, run_step


def run_ab(family: str, steps: int, batch_size: int = 2, frames: int = 16,
           seed: int = 0, outdir: str = "/tmp/ab_ref"):
    _install_reference_shims()
    config = load_config(family)
    batches = make_batches(config, steps, batch_size, frames, seed)
    trainer = build_torch_trainer(config, outdir, seed)
    state, run_step = build_jax_runner(config, trainer.model)

    is_style = config["generator_type"] == "StyleMelGANGenerator"

    def torch_step(b):
        if not is_style:
            trainer._train_step(to_torch_batch(config, b))
            return
        # replay OUR pinned window offsets in the reference's draw order:
        # G-phase D(y_), then D-phase D(y), D(y_) (train.py:265-335;
        # np.random.randint draw at models/style_melgan.py:330-336)
        queue = list(np.concatenate(
            [b["rwd_starts_adv"], b["rwd_starts_real"], b["rwd_starts_fake"]]
        ))
        orig = np.random.randint

        def replay(high, *args, **kwargs):
            assert not args and not kwargs, "unexpected randint signature"
            start = queue.pop(0)
            assert 0 <= start < high, f"pinned start {start} out of [0,{high})"
            return int(start)

        np.random.randint = replay
        try:
            trainer._train_step(to_torch_batch(config, b))
        finally:
            np.random.randint = orig
        assert not queue, f"{len(queue)} pinned window draws unconsumed"

    records = []
    prev = {}
    for i, b in enumerate(batches):
        torch_step(b)
        cur = dict(trainer.total_train_loss)
        torch_losses = {k: cur.get(k, 0.0) - prev.get(k, 0.0) for k in cur}
        prev = cur
        state, ours = run_step(state, b, i)
        rec = {"step": i + 1}
        for ok, tk in LOSS_KEYS.items():
            if ok in ours and tk in torch_losses:
                rec[ok] = {
                    "ours": ours[ok],
                    "torch": torch_losses[tk],
                }
        records.append(rec)

    # summary: per-key relative difference |ours-torch| / max(|torch|, 0.1)
    summary = {}
    for key in records[0]:
        if key == "step":
            continue
        rel = [
            abs(r[key]["ours"] - r[key]["torch"])
            / max(abs(r[key]["torch"]), 0.1)
            for r in records
        ]
        summary[key] = {
            "first_step_rel": rel[0],
            "first10_max_rel": max(rel[: min(10, len(rel))]),
            "max_rel": max(rel),
            "final_rel": rel[-1],
            "final_ours": records[-1][key]["ours"],
            "final_torch": records[-1][key]["torch"],
        }
    return {"family": family, "config": FAMILY_CONFIGS[family],
            "steps": steps, "batch_size": batch_size, "frames": frames,
            "summary": summary, "records": records}


def main():
    # the axon TPU plugin's sitecustomize exports JAX_PLATFORMS=axon, so a
    # setdefault would silently leave the A/B on the tunneled chip (bf16
    # MXU convs -> ~1e-2 forward drift); force CPU f32 like tests/conftest.py
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="hifigan,pwg,mb_melgan")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "TRAINER_AB.json"))
    args = ap.parse_args()

    results = []
    for family in args.families.split(","):
        family = family.strip()
        res = run_ab(family, args.steps, args.batch_size, args.frames)
        results.append(res)
        print(json.dumps({"family": family,
                          "summary": res["summary"]}, indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
