"""Criterion bundle: loss functions instantiated from a YAML config.

Behavioral reference: /root/reference/parallel_wavegan/bin/train.py:1395-1451
(use_* toggles with keep-compatibility defaults, loss params, PQMF
construction when the generator is multi-band).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from parallelwavegan_tpu.losses import (
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
    GeneratorAdversarialLoss,
    MelSpectrogramLoss,
    MultiResolutionSTFTLoss,
)
from parallelwavegan_tpu.ops.pqmf import PQMF


@dataclass(frozen=True)
class Criterion:
    """All loss callables + lambda weights for one experiment config."""

    gen_adv: GeneratorAdversarialLoss
    dis_adv: DiscriminatorAdversarialLoss
    stft: MultiResolutionSTFTLoss | None
    sub_stft: MultiResolutionSTFTLoss | None
    mel: MelSpectrogramLoss | None
    feat_match: FeatureMatchLoss | None
    pqmf: PQMF | None
    lambda_aux: float
    lambda_adv: float
    lambda_feat_match: float
    lambda_commit: float = 0.25
    use_duration_loss: bool = False
    duration_offset: float = 1.0

    @property
    def use_stft_loss(self) -> bool:
        return self.stft is not None

    @property
    def use_subband_stft_loss(self) -> bool:
        return self.sub_stft is not None

    @property
    def use_mel_loss(self) -> bool:
        return self.mel is not None

    @property
    def use_feat_match_loss(self) -> bool:
        return self.feat_match is not None


def build_criterion(config: dict) -> Criterion:
    """Instantiate the criterion bundle from a config dict.

    Mutates nothing; applies the reference's backward-compat defaults
    (train.py:1395-1443): stft on / subband off / mel off / fm off when the
    keys are absent.
    """
    config.setdefault("use_stft_loss", True)
    config.setdefault("use_subband_stft_loss", False)
    config.setdefault("use_mel_loss", False)
    config.setdefault("use_feat_match_loss", False)
    config.setdefault("use_duration_loss", False)

    stft = None
    if config["use_stft_loss"]:
        params = dict(config.get("stft_loss_params", {}))
        params.pop("window", None)
        stft = MultiResolutionSTFTLoss(**params)
    sub_stft = None
    if config["use_subband_stft_loss"]:
        assert config["generator_params"]["out_channels"] > 1
        params = dict(config.get("subband_stft_loss_params", {}))
        params.pop("window", None)
        sub_stft = MultiResolutionSTFTLoss(**params)
    mel = None
    if config["use_mel_loss"]:
        params = dict(
            config.get("mel_loss_params")
            or {
                "fs": config["sampling_rate"],
                "fft_size": config["fft_size"],
                "hop_size": config["hop_size"],
                "win_length": config["win_length"],
                "window": config["window"],
                "num_mels": config["num_mels"],
                "fmin": config["fmin"],
                "fmax": config["fmax"],
            }
        )
        mel = MelSpectrogramLoss(**params)
    feat_match = None
    if config["use_feat_match_loss"]:
        feat_match = FeatureMatchLoss(**config.get("feat_match_loss_params", {}))

    gen_adv = GeneratorAdversarialLoss(**config.get("generator_adv_loss_params", {}))
    dis_adv = DiscriminatorAdversarialLoss(
        **config.get("discriminator_adv_loss_params", {})
    )

    pqmf = None
    if config["generator_params"].get("out_channels", 1) > 1 and config.get(
        "generator_type"
    ) != "VQVAE":
        pqmf = PQMF(
            subbands=config["generator_params"]["out_channels"],
            **config.get("pqmf_params", {}),
        )
    elif config.get("generator_type") == "VQVAE" and config[
        "generator_params"
    ].get("in_channels", 1) > 1:
        pqmf = PQMF(
            subbands=config["generator_params"]["in_channels"],
            **config.get("pqmf_params", {}),
        )

    if not any(
        config[k]
        for k in ("use_stft_loss", "use_subband_stft_loss", "use_mel_loss")
    ) and config.get("generator_type") != "VQVAE":
        logging.warning("no auxiliary (stft/mel) loss is enabled")

    return Criterion(
        gen_adv=gen_adv,
        dis_adv=dis_adv,
        stft=stft,
        sub_stft=sub_stft,
        mel=mel,
        feat_match=feat_match,
        pqmf=pqmf,
        lambda_aux=config.get("lambda_aux", 1.0),
        lambda_adv=config.get("lambda_adv", 1.0),
        lambda_feat_match=config.get("lambda_feat_match", 1.0),
        lambda_commit=config.get("lambda_commit", 0.25),
        use_duration_loss=config.get("use_duration_loss", False),
    )
