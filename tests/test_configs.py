"""Every shipped recipe config must wire: models, criterion, optimizers."""

import glob
import os

import pytest
import yaml

from parallelwavegan_tpu.models import get_model_class
from parallelwavegan_tpu.optimizers import build_optimizer_from_config
from parallelwavegan_tpu.train.criterion import build_criterion

REPO = os.path.join(os.path.dirname(__file__), "..")
CONFIGS = sorted(glob.glob(os.path.join(REPO, "egs", "*", "*", "conf", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_wires(path):
    with open(path) as f:
        config = yaml.safe_load(f)
    gen_cls = get_model_class(
        config.get("generator_type", "ParallelWaveGANGenerator")
    )
    dis_cls = get_model_class(
        config.get("discriminator_type", "ParallelWaveGANDiscriminator")
    )
    gen_params = {
        k.replace("upsample_kernal_sizes", "upsample_kernel_sizes"): v
        for k, v in config["generator_params"].items()
    }
    gen = gen_cls(**gen_params)
    dis = dis_cls(**config["discriminator_params"])
    assert gen is not None and dis is not None
    criterion = build_criterion(config)
    assert criterion.gen_adv is not None
    build_optimizer_from_config(config, "generator")
    build_optimizer_from_config(config, "discriminator")
    # training-surface keys the trainer relies on
    assert "batch_max_steps" in config
    assert "train_max_steps" in config


def test_compilation_cache_env_resolution(tmp_path, monkeypatch):
    """utils/cache.py: explicit dir > env (off disables) > default."""
    from parallelwavegan_tpu.utils import cache

    monkeypatch.setenv("PWG_COMPILATION_CACHE", "off")
    assert cache.enable_compilation_cache() is None

    target = str(tmp_path / "xla")
    monkeypatch.setenv("PWG_COMPILATION_CACHE", target)
    assert cache.enable_compilation_cache() == target
    assert os.path.isdir(target)

    explicit = str(tmp_path / "explicit")
    # explicit argument wins over the env var
    assert cache.enable_compilation_cache(explicit) == explicit

    # reset so later tests in this process don't write cache entries
    # into a deleted tmp dir
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
