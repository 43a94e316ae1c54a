"""Fused HiFi-GAN MRF stage (all resblocks of one scale) as one Pallas kernel.

An MRF stage averages N resblocks; each resblock is, per dilation,
``x += conv_k1(leaky(conv_kd(leaky(x))))`` with 'same' zero padding
(reference layers/residual_block.py:143-258). Run as XLA ops, the
long-time small-channel stages (C=32..64 at 65k-131k samples) are heavily
HBM-bound: every conv re-reads/re-writes the full activation. This kernel
keeps the stage input block and every intermediate in VMEM; each time tile
is read once and the averaged stage output written once.

Same-padding semantics at sequence edges are reproduced with per-conv
masking of out-of-sequence rows (cf. wavenet_stack.py). Inference-only.

STATUS (v5e, round 1): numerically exact (2.3e-4 on the full generator on
chip), but 2-4x SLOWER than XLA's in-context schedule and therefore off
by default. Careful attribution (per-stage ablation INSIDE one jitted
generator, not an isolated twin microbenchmark — the isolated twin is 2x
pessimistic and misled round-1 tuning) puts in-context XLA at C=32@131k:
3.5 ms, C=64@65k: 1.6, C=128@33k: 2.6, C=256@4k: 0.5. This kernel: 6.7 /
4.7 / 3.9 ms. Channel-by-tap im2col packing (below) made the matmuls
K*C-wide but bought nothing — the kernel is bound by VPU masking/layout
churn, not MXU lanes. XLA's win at C<128 most likely comes from packing
multiple time steps into the 128-lane dimension (space-to-depth), which
would need native lane-rotate shifts here; that, or fusing the upsample
deconv into the same kernel, is the remaining idea (ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _leaky(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def hifigan_mrf_xla(x, blocks, slope=0.1):
    """XLA twin. blocks: list of dicts with keys
    w1 (n_dil, K, C, C), b1 (n_dil, C), w2, b2, 'dilations' (tuple)."""
    acc = 0.0
    for blk in blocks:
        xb = x
        k = blk["w1"].shape[1]
        for di, d in enumerate(blk["dilations"]):
            t = _leaky(xb, slope)
            pad = (k - 1) // 2 * d
            z = lax.conv_general_dilated(
                t, blk["w1"][di], (1,), [(pad, pad)], rhs_dilation=(d,),
                dimension_numbers=("NTC", "TIO", "NTC"),
            ) + blk["b1"][di]
            z = _leaky(z, slope)
            pad2 = (k - 1) // 2
            z = lax.conv_general_dilated(
                z, blk["w2"][di], (1,), [(pad2, pad2)],
                dimension_numbers=("NTC", "TIO", "NTC"),
            ) + blk["b2"][di]
            xb = xb + z
        acc = acc + xb
    return acc / len(blocks)


def _kernel(
    xp_hbm, *refs_and_outs, t_tile, halo, block_specs, slope, seq_len,
    n_blocks,
):
    # refs layout: per block (w1, b1, w2, b2) then out, scratch, im2col, sem
    w_refs = refs_and_outs[: 4 * n_blocks]
    out = refs_and_outs[4 * n_blocks]
    x_scratch = refs_and_outs[4 * n_blocks + 1]
    im2col = refs_and_outs[4 * n_blocks + 2]
    sem = refs_and_outs[4 * n_blocks + 3]

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)  # one resblock per grid step: fewer live buffers
    rows = t_tile + 2 * halo

    # TPU grid steps run sequentially on the core, so the scratch persists
    # across the inner block dimension: DMA the tile only once
    @pl.when(j == 0)
    def _():
        dma = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(i * t_tile, rows), :], x_scratch, sem
        )
        dma.start()
        dma.wait()

    # DMA'd block is 128-lane padded; compute at the true channel width so
    # the resident weights stay unpadded (the padding cost ~4-16x VMEM)
    c0 = w_refs[0].shape[-1]
    xv0 = x_scratch[:][:, :c0]
    pos0 = i * t_tile - halo

    def block_out(j_static):
        w1, b1, w2, b2 = w_refs[4 * j_static : 4 * j_static + 4]
        k, dilations = block_specs[j_static]
        xb = xv0
        off, length = 0, rows
        for di, d in enumerate(dilations):
            # mask out-of-sequence rows so 'same' zero padding per conv is
            # reproduced exactly at utterance boundaries
            gpos = pos0 + off + lax.broadcasted_iota(
                jnp.int32, (length, 1), 0
            )
            valid = (gpos >= 0) & (gpos < seq_len)
            t = jnp.where(valid, _leaky(xb, slope), jnp.zeros_like(xb))
            pad = (k - 1) * d
            len1 = length - pad

            # channel-by-tap im2col: one (len1, K*C) @ (K*C, C) matmul
            # instead of K narrow C-contractions — at C=32..64 this widens
            # the MXU contraction from C/128 lanes to K*C/128. Mosaic can't
            # concat register slices with mismatched sublane offsets, so
            # the packing goes through a VMEM scratch (stores realign).
            def pack(src, length_out, step, kk_count):
                c_src = src.shape[-1]
                for kk in range(kk_count):
                    im2col[pl.ds(0, length_out),
                           pl.ds(kk * c_src, c_src)] = lax.slice_in_dim(
                        src, kk * step, kk * step + length_out, axis=0
                    )
                return im2col[pl.ds(0, length_out),
                              pl.ds(0, kk_count * c_src)]

            z = jnp.dot(pack(t, len1, d, k), w1[di],
                        preferred_element_type=jnp.float32)
            z = (z + b1[di][None, :]).astype(xb.dtype)
            # second conv (dilation 1), input masked the same way
            gpos2 = pos0 + off + pad // 2 + lax.broadcasted_iota(
                jnp.int32, (len1, 1), 0
            )
            valid2 = (gpos2 >= 0) & (gpos2 < seq_len)
            z = jnp.where(valid2, _leaky(z, slope), jnp.zeros_like(z))
            pad2 = k - 1
            len2 = len1 - pad2
            z2 = jnp.dot(pack(z, len2, 1, k), w2[di],
                         preferred_element_type=jnp.float32)
            z2 = z2 + b2[di][None, :]
            shrink = pad // 2 + pad2 // 2
            xb = (
                lax.slice_in_dim(xb, shrink, shrink + len2, axis=0)
                + z2.astype(xb.dtype)
            )
            off += shrink
            length = len2
        rel = halo - off
        return lax.slice_in_dim(xb, rel, rel + t_tile, axis=0).astype(
            jnp.float32
        ) / n_blocks

    contrib = lax.switch(j, [functools.partial(block_out, jj)
                             for jj in range(n_blocks)])

    @pl.when(j == 0)
    def _():
        out[0] = contrib.astype(out.dtype)

    @pl.when(j > 0)
    def _():
        out[0] = out[0] + contrib.astype(out.dtype)


def fused_hifigan_mrf(
    x, blocks, *, slope: float = 0.1, t_tile: int = 2048,
    compute_dtype=jnp.float32, interpret: bool = False,
):
    """Fused MRF stage: x (B, T, C) -> averaged resblock outputs (B, T, C).

    blocks: list of dicts {w1 (n_dil, K, C, C), b1 (n_dil, C), w2, b2,
    dilations}.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    b, t, c0 = x.shape
    c = _round_up(c0, 128)
    halo = _round_up(
        max(
            sum((blk["w1"].shape[1] - 1) // 2 * (int(d) + 1)
                for d in blk["dilations"])
            for blk in blocks
        ),
        8,
    )
    t_tile = min(t_tile, _round_up(t, 8))
    n_tiles = -(-t // t_tile)
    t_padded = n_tiles * t_tile

    def pad_last(a, target):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, target - a.shape[-1])])

    xp = jnp.pad(
        pad_last(x.astype(compute_dtype), c),
        ((0, 0), (halo, halo + t_padded - t), (0, 0)),
    )
    flat_w = []
    block_specs = []
    for blk in blocks:
        nd, kb, cb, _ = blk["w1"].shape
        flat_w += [
            # (n_dil, K, C, C) -> (n_dil, K*C, C) for the im2col matmul
            blk["w1"].astype(compute_dtype).reshape(nd, kb * cb, cb),
            blk["b1"].astype(jnp.float32),
            blk["w2"].astype(compute_dtype).reshape(nd, kb * cb, cb),
            blk["b2"].astype(jnp.float32),
        ]
        block_specs.append(
            (int(blk["w1"].shape[1]), tuple(int(d) for d in blk["dilations"]))
        )

    kernel = functools.partial(
        _kernel, t_tile=t_tile, halo=halo, block_specs=tuple(block_specs),
        slope=slope, seq_len=t, n_blocks=len(blocks),
    )
    rows = t_tile + 2 * halo
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for w in flat_w:
        in_specs.append(
            pl.BlockSpec(w.shape, (lambda bb, ii, jj, nd=w.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles, len(blocks)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_tile, c0), lambda bb, ii, jj: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_padded, c0), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, c), compute_dtype),
            pltpu.VMEM(
                (rows,
                 _round_up(max(k for k, _ in block_specs) * c0, 128)),
                compute_dtype,
            ),
            pltpu.SemaphoreType.DMA,
        ],
        # unrolled dilation temporaries live on the scoped-vmem stack; the
        # 16 MB default caps t_tile (cf. wavenet_stack.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *flat_w)
    return out[:, :t, :]
