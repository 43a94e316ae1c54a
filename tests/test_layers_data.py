"""Layer math + data-pipeline tests.

Mirrors the reference's layer test strategy (test/test_layers.py: upsample
length/identity, PQMF round trips) plus collater/loader/checkpoint tests
the reference lacks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelwavegan_tpu.data.collater import Collater
from parallelwavegan_tpu.data.loader import DataLoader
from parallelwavegan_tpu.layers.upsample import (
    ConvInUpsampleNetwork,
    UpsampleNetwork,
    stretch_time,
)
from parallelwavegan_tpu.ops.pqmf import PQMF, design_prototype_filter


# -------------------------------------------------------------- PQMF


@pytest.mark.parametrize("subbands,taps,cutoff,beta", [
    (4, 62, 0.142, 9.0),
    (3, 62, 0.185, 9.0),  # cutoff tuned for 3 bands (0.142 is 4-band-tuned)
    (2, 62, 0.267, 9.0),
    (8, 62, 0.07949, 9.0),
])
def test_pqmf_analysis_synthesis_roundtrip(subbands, taps, cutoff, beta):
    pqmf = PQMF(subbands, taps, cutoff, beta)
    rs = np.random.RandomState(0)
    t = subbands * 128
    x = jnp.asarray(rs.randn(2, t, 1), jnp.float32)
    sub = pqmf.analysis(x)
    assert sub.shape == (2, t // subbands, subbands)
    rec = pqmf.synthesis(sub)
    assert rec.shape == x.shape
    # symmetric taps//2 padding on both passes keeps the cascade delay-free;
    # compare directly away from the filter edges (near-perfect, not perfect)
    a = np.asarray(rec)[0, taps:-taps, 0]
    b = np.asarray(x)[0, taps:-taps, 0]
    rel = np.abs(a - b).max() / np.abs(b).max()
    assert rel < 0.05, rel


def test_prototype_filter_is_lowpass():
    h = design_prototype_filter(62, 0.142, 9.0)
    H = np.abs(np.fft.rfft(h, 2048))
    assert H[0] > H[-1] * 10


# -------------------------------------------------------------- upsample


def test_stretch_time_nearest():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    y = stretch_time(x, 2)
    assert y.shape == (1, 6, 2)
    np.testing.assert_array_equal(np.asarray(y)[0, 0], np.asarray(y)[0, 1])


def test_upsample_network_length():
    net = UpsampleNetwork(upsample_scales=[4, 4])
    c = jnp.ones((2, 10, 5))
    params = net.init(jax.random.key(0), c)
    y = net.apply(params, c)
    assert y.shape == (2, 160, 5)
    # 1/k-init smoothing conv preserves a constant signal in the interior
    # (zero padding tapers ~2*scale samples at each stage's edges)
    np.testing.assert_allclose(np.asarray(y)[:, 40:-40, :], 1.0, atol=1e-5)


def test_conv_in_upsample_network_context_window():
    win = 2
    net = ConvInUpsampleNetwork(
        upsample_scales=[4, 4], aux_channels=5, aux_context_window=win
    )
    c = jnp.ones((2, 10 + 2 * win, 5))
    params = net.init(jax.random.key(0), c)
    y = net.apply(params, c)
    assert y.shape == (2, 160, 5)


# -------------------------------------------------------------- collater


def _items(n, fs=64, frames=40, mels=6):
    rs = np.random.RandomState(0)
    out = []
    for _ in range(n):
        f = frames + rs.randint(0, 10)
        out.append((rs.randn(f * fs).astype(np.float32),
                    rs.randn(f, mels).astype(np.float32)))
    return out


def test_collater_mel2wav_shapes():
    col = Collater(batch_max_steps=512, hop_size=64, aux_context_window=2,
                   use_noise_input=True,
                   rng=np.random.default_rng(0))
    batch = col(_items(4))
    assert batch["y"].shape == (4, 512, 1)
    assert batch["c"].shape == (4, 512 // 64 + 4, 6)
    assert batch["z"].shape == (4, 512, 1)
    # audio crop aligns with mel crop on the hop grid
    assert batch["y"].dtype == np.float32


def test_collater_filters_short_items():
    col = Collater(batch_max_steps=512, hop_size=64, aux_context_window=0,
                   rng=np.random.default_rng(0))
    items = _items(3) + [(np.zeros(64, np.float32), np.zeros((1, 6), np.float32))]
    batch = col(items)
    assert batch["y"].shape[0] == 3  # short item dropped


def test_collater_duration_branch():
    col = Collater(batch_max_steps=512, hop_size=64, aux_context_window=0,
                   use_duration=True, rng=np.random.default_rng(0))
    rs = np.random.RandomState(1)
    items = []
    for _ in range(2):
        frames = 20
        tokens = np.repeat(rs.randint(0, 5, frames // 4), 4)[:, None]
        items.append((rs.randn(frames * 64).astype(np.float32),
                      np.concatenate([tokens, tokens * 0], axis=1)))
    batch = col(items)
    assert batch["y"].shape == (2, 512, 1)
    assert batch["ds"].sum(axis=1).max() <= 512 // 64
    assert batch["c"].shape[0] == 2


def test_collater_f0_excitation_sample_alignment():
    """Excitation stored (frames, hop) — reference preprocess.py:440-442 —
    must crop to exactly the samples under the audio crop."""
    hop, steps = 64, 512
    col = Collater(batch_max_steps=steps, hop_size=hop, aux_context_window=0,
                   use_f0_and_excitation=True, rng=np.random.default_rng(0))
    rs = np.random.RandomState(2)
    items = []
    for _ in range(3):
        frames = steps // hop + rs.randint(2, 8)
        audio = rs.randn(frames * hop).astype(np.float32)
        mel = rs.randn(frames, 6).astype(np.float32)
        f0 = rs.rand(frames).astype(np.float32) * 5
        exc = np.arange(frames * hop, dtype=np.float32).reshape(frames, hop)
        items.append((audio, mel, f0, exc))
    batch = col(items)
    assert batch["excitation"].shape == (3, steps, 1)
    assert batch["f0"].shape == (3, steps // hop, 1)
    # the flattened excitation crop must be a contiguous hop-aligned run
    for b in range(3):
        e = batch["excitation"][b, :, 0]
        assert e[0] % hop == 0
        np.testing.assert_array_equal(e, e[0] + np.arange(steps))


def test_extract_f0_excitation_log_domain():
    """f0 is log-Hz on voiced frames and the sine excitation is built from
    the logged track (reference preprocess.py:92-133 pipeline order)."""
    from parallelwavegan_tpu.ops.f0 import extract_f0_and_excitation

    fs, hop = 8000, 64
    t = np.arange(fs) / fs
    audio = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)
    f0, exc = extract_f0_and_excitation(audio, fs, hop)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0
    # log(200) ~ 5.3 — not 200
    assert np.all(voiced < 10.0), voiced.max()
    assert abs(np.median(voiced) - np.log(200.0)) < 0.2
    assert len(exc) == len(f0) * hop


def test_loader_sharding_partitions_dataset():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    seen = []
    for shard in range(2):
        dl = DataLoader(DS(), lambda items: list(items), batch_size=1,
                        shuffle=False, shard_index=shard, num_shards=2)
        seen.extend(sum((b for b in dl.epoch_batches(0)), []))
    assert sorted(seen) == list(range(10))


def test_loader_deterministic_across_num_workers():
    """Parallel batch assembly must reproduce the serial stream bit-exactly
    (per-batch child rng, ordered consumption)."""

    class DS:
        def __init__(self):
            self.items = _items(12, frames=24)

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    ds = DS()
    col = Collater(batch_max_steps=512, hop_size=64, aux_context_window=0,
                   use_noise_input=True)
    streams = []
    for nw in (1, 4):
        it = iter(DataLoader(ds, col, batch_size=4, seed=3, num_workers=nw))
        streams.append([next(it) for _ in range(8)])
    for b1, b4 in zip(*streams):
        assert set(b1) == set(b4)
        for k in b1:
            np.testing.assert_array_equal(b1[k], b4[k])


def test_collater_vq_local_boundary_length_filtered():
    """A local-conditioned item whose length EQUALS the threshold must be
    dropped (strict >), not crash rng.integers with an empty range."""
    col = Collater(batch_max_steps=640, hop_size=64, aux_context_window=0,
                   use_aux_input=False, use_local_condition=True,
                   rng=np.random.default_rng(0))
    rs = np.random.RandomState(0)
    long_item = (rs.randn(20 * 64).astype(np.float32),
                 rs.randn(20, 2).astype(np.float32))
    boundary = (rs.randn(10 * 64).astype(np.float32),
                rs.randn(10, 2).astype(np.float32))  # == mel_threshold
    batch = col([long_item, boundary])
    assert batch["y"].shape == (1, 640, 1)
    assert batch["local"].shape == (1, 10, 2)


def test_collater_vq_all_short_raises_explicitly():
    col = Collater(batch_max_steps=640, hop_size=64, aux_context_window=0,
                   use_aux_input=False, use_local_condition=False,
                   rng=np.random.default_rng(0))
    import pytest

    with pytest.raises(ValueError, match="audio_threshold"):
        col([np.zeros(640, np.float32)])  # length == threshold: filtered


# -------------------------------------------------------------- checkpoint


def test_checkpoint_save_load_roundtrip(tmp_path):
    import optax

    from parallelwavegan_tpu.utils.checkpoint import (
        load_checkpoint,
        load_generator_params,
        save_checkpoint,
    )
    from parallelwavegan_tpu.train.state import init_train_state

    params_g = {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    params_d = {"w": jnp.zeros(3)}
    tx = optax.adam(1e-3)
    state = init_train_state(params_g, params_d, tx, tx)
    state = state.replace(steps=jnp.asarray(7, jnp.int32))
    path = os.path.join(tmp_path, "ckpt.pkl")
    save_checkpoint(path, state, epochs=3)

    fresh = init_train_state(params_g, params_d, tx, tx)
    restored, epochs = load_checkpoint(path, fresh)
    assert int(np.asarray(restored.steps)) == 7
    assert epochs == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params_g["w"]), np.arange(4.0)
    )

    only_params, _ = load_checkpoint(path, fresh, load_only_params=True)
    assert int(np.asarray(only_params.steps)) == 0

    g, vars_g, steps = load_generator_params(path)
    assert steps == 7
    np.testing.assert_array_equal(np.asarray(g["w"]), np.arange(4.0))


def test_loader_tops_up_dropped_items_to_static_batch():
    """remove_short_samples=false leaves short items to the Collater; the
    loader must still yield the STATIC batch size (varying B breaks
    multi-host lockstep and forces jit recompiles)."""
    rs = np.random.RandomState(0)
    items = _items(3, frames=24) + [
        (np.zeros(4 * 64, np.float32), np.zeros((4, 6), np.float32))
    ]

    class DS:
        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            return items[i]

    col = Collater(batch_max_steps=512, hop_size=64, aux_context_window=0,
                   rng=np.random.default_rng(0))
    loader = DataLoader(DS(), col, batch_size=4, shuffle=False, seed=0)
    batch = next(iter(loader))
    assert batch["y"].shape[0] == 4  # short item dropped, batch topped up
    eval_batch = next(iter(loader.epoch_batches(0)))
    assert eval_batch["y"].shape[0] == 4


def test_loader_shards_draw_independent_rng_streams():
    """Multi-host: each shard's collater rng must differ (same (seed,seq)
    on every host would duplicate noise/crops across the global batch)."""
    items = _items(8, frames=24)

    class DS:
        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            return items[i]

    batches = []
    for shard in (0, 1):
        col = Collater(batch_max_steps=512, hop_size=64,
                       aux_context_window=0, use_noise_input=True,
                       rng=np.random.default_rng(0))
        loader = DataLoader(DS(), col, batch_size=2, shuffle=False, seed=0,
                            shard_index=shard, num_shards=2)
        batches.append(next(iter(loader)))
    assert not np.array_equal(batches[0]["z"], batches[1]["z"])
