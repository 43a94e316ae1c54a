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

STATUS (v5e, round 1): the plain per-channel kernel below is numerically
exact but 2-4x slower than XLA's in-context schedule (isolated-twin
microbenchmarks are ~2x pessimistic about XLA and misled early tuning;
in-context XLA per stage: C=32@131k 3.5 ms, C=64@65k 1.6, C=128@33k 2.6,
C=256@4k 0.5). Channel-by-tap im2col packing bought nothing (VPU/layout
bound, not MXU lanes). The SPACE-TO-DEPTH PACKED variant at the bottom
(``fused_hifigan_mrf_packed``) is the one that wins: packing p=128/C
consecutive samples into the lane dimension makes every conv tap a dense
(rows,128)@(128,128) matmul. Isolated: 2.8 ms @ C=32/131k vs 6.1 XLA,
2.7 ms @ C=64/65k vs 4.2. In-context on the full HiFi-GAN v1 generator
(frames=512): 11.4 ms all-XLA -> 10.5 ms with packed C<=64 stages
(RTF 0.00192 -> 0.00177); enabling it for the C=32 stage alone is a
LOSS (12.4 ms) — the pack/unpack layout ops around a single stage cost
more than the kernel saves, so the flag packs both or neither.
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
    # maximum form, not where(x >= 0, ...): equivalent for 0 < slope < 1,
    # and the Mosaic toolchain 500s on select-with-bf16-compare inside
    # kernels (found round 5 bisect) while maximum lowers fine
    return jnp.maximum(x, x * jnp.asarray(slope, x.dtype))


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


# --------------------------------------------------------------------------
# space-to-depth packed variant: p consecutive time steps share the 128-lane
# dimension, so every matmul contracts over p*C = 128 lanes instead of C.
# A k-tap dilated conv becomes a handful of packed-row shifts, each a dense
# (len, 128) @ (128, 128) matmul whose weight is the block matrix
#   W_s[j_in*C+ci, j_out*C+co] = w[kk, ci, co]
# for every tap kk whose offset lands output phase j_out on input phase
# j_in of packed row r+s. At C=32 (p=4) this runs the MXU at full lane
# width where the unpacked kernel and XLA use 32/128 lanes.
# --------------------------------------------------------------------------


def _conv_shift_table(k: int, d: int, p: int):
    """Static {s: [(j_in, j_out, kk), ...]} for a centered k-tap dilation-d
    conv over p-packed rows."""
    table = {}
    for j_out in range(p):
        for kk in range(k):
            tot = j_out + (kk - (k - 1) // 2) * d
            s, j_in = tot // p, tot % p
            table.setdefault(s, []).append((j_in, j_out, kk))
    return dict(sorted(table.items()))


def _pack_conv_weights(w, b, d: int, p: int, c0p: int):
    """(k, C, C) taps -> {s: (p*c0p, p*c0p) block matrix}, bias -> (p*c0p,).

    The true channel count C may be < c0p (lane padding); blocks are laid
    out at c0p strides so packed lane j*c0p+ci addresses phase j channel ci.
    """
    from parallelwavegan_tpu.ops.pallas_kernels.packing import (
        pack_block_bias,
        pack_block_weights,
    )

    table = _conv_shift_table(k=w.shape[0], d=d, p=p)
    lanes = p * c0p
    # one static-index gather materialises all shift matrices (packing.py)
    stacked = pack_block_weights(table.values(), w, c0p, c0p, lanes=lanes)
    mats = {s: stacked[i] for i, s in enumerate(table)}
    bias = pack_block_bias(b, p, c0p, lanes=lanes)
    return mats, bias


def _kernel_packed(
    xp_hbm,  # (B, rows_total, 128) ANY — p-packed
    *refs_and_outs, t_tile: int, halo: int, p: int, c0p: int,
    conv_specs: tuple, slope: float, seq_len: int, n_blocks: int,
):
    """conv_specs: per block, per dilation, ((s_list1), (s_list2)) of static
    shift values; weight refs are stacked (n_shift, 128, 128) per conv."""
    # layout: for each block, for each dilation: w1mats, b1, w2mats, b2
    idx = 0
    w_refs = []
    for spec in conv_specs:
        per_dil = []
        for _ in spec:
            per_dil.append(tuple(refs_and_outs[idx : idx + 4]))
            idx += 4
        w_refs.append(per_dil)
    out = refs_and_outs[idx]
    x_scratch = refs_and_outs[idx + 1]
    sem = refs_and_outs[idx + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    rows = t_tile + 2 * halo

    @pl.when(j == 0)
    def _():
        dma = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(i * t_tile, rows), :], x_scratch, sem
        )
        dma.start()
        dma.wait()

    xv0 = x_scratch[:]
    pos0 = i * t_tile - halo  # packed-row coordinate of block row 0

    def mask_rows(val, off, length):
        """Zero rows/lanes whose SAMPLE position is outside [0, seq_len)."""
        row = lax.broadcasted_iota(jnp.int32, (length, val.shape[-1]), 0)
        lane = lax.broadcasted_iota(jnp.int32, (length, val.shape[-1]), 1)
        samp = (pos0 + off + row) * p + lane // c0p
        ok = (samp >= 0) & (samp < seq_len)
        return jnp.where(ok, val, jnp.zeros_like(val))

    def apply_conv(src, off, length, shifts, wmat_ref, bias_ref):
        s_min, s_max = shifts[0], shifts[-1]
        new_len = length - (s_max - s_min)
        z = None
        for si, s in enumerate(shifts):
            contrib = jnp.dot(
                lax.slice_in_dim(src, s - s_min, s - s_min + new_len, axis=0),
                wmat_ref[si],
                preferred_element_type=jnp.float32,
            )
            z = contrib if z is None else z + contrib
        z = z + bias_ref[:][None, :]
        return z, off - s_min, new_len

    def block_out(j_static):
        spec = conv_specs[j_static]
        refs = w_refs[j_static]
        xb = xv0
        off, length = 0, rows
        for di, (shifts1, shifts2) in enumerate(spec):
            w1m, b1, w2m, b2 = refs[di]
            t = mask_rows(_leaky(xb, slope), off, length)
            z, off1, len1 = apply_conv(t, off, length, shifts1, w1m, b1)
            z = z.astype(xb.dtype)
            z = mask_rows(_leaky(z, slope), off1, len1)
            z2, off2, len2 = apply_conv(z, off1, len1, shifts2, w2m, b2)
            xb = (
                lax.slice_in_dim(xb, off2 - off, off2 - off + len2, axis=0)
                + z2.astype(xb.dtype)
            )
            off, length = off2, len2
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


def fused_hifigan_mrf_packed(
    x, blocks, *, slope: float = 0.1, t_tile: int = 512,
    compute_dtype=jnp.float32, interpret: bool = False,
):
    """Space-to-depth fused MRF: x (B, T, C) with C <= 64 -> (B, T, C).

    t_tile is in PACKED rows (p samples each).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    b, t, c0 = x.shape
    c0p = 32 if c0 <= 32 else 64
    assert c0 <= 64, "packed variant needs C <= 64 (use fused_hifigan_mrf)"
    p = 128 // c0p

    # static shift specs + packed weights
    conv_specs = []
    flat_w = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    hl = hr = 0
    for blk in blocks:
        k = int(blk["w1"].shape[1])
        spec = []
        bl = br = 0
        for di, d in enumerate(blk["dilations"]):
            t1 = _conv_shift_table(k, int(d), p)
            t2 = _conv_shift_table(k, 1, p)
            s1, s2 = tuple(t1.keys()), tuple(t2.keys())
            spec.append((s1, s2))
            m1, bias1 = _pack_conv_weights(
                blk["w1"][di].astype(compute_dtype),
                blk["b1"][di].astype(jnp.float32), int(d), p, c0p)
            m2, bias2 = _pack_conv_weights(
                blk["w2"][di].astype(compute_dtype),
                blk["b2"][di].astype(jnp.float32), 1, p, c0p)
            flat_w += [jnp.stack([m1[s] for s in s1]), bias1,
                       jnp.stack([m2[s] for s in s2]), bias2]
            bl += -s1[0] - s2[0]
            br += s1[-1] + s2[-1]
        conv_specs.append(tuple(spec))
        hl, hr = max(hl, bl), max(hr, br)
    halo = _round_up(max(hl, hr), 8)

    for w in flat_w:
        in_specs.append(
            pl.BlockSpec(w.shape, (lambda bb, ii, jj, nd=w.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
        )

    # pack: pad channels to c0p, pad time to p*t_tile grid, reshape
    t_tile = min(t_tile, _round_up(-(-t // p), 8))
    n_tiles = -(-t // (p * t_tile))
    t_rows = n_tiles * t_tile

    def pad_last(a, target):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, target - a.shape[-1])])

    xp = jnp.pad(pad_last(x.astype(compute_dtype), c0p),
                 ((0, 0), (0, t_rows * p - t), (0, 0)))
    xp = xp.reshape(b, t_rows, p * c0p)
    xp = jnp.pad(xp, ((0, 0), (halo, halo), (0, 0)))

    kernel = functools.partial(
        _kernel_packed, t_tile=t_tile, halo=halo, p=p, c0p=c0p,
        conv_specs=tuple(conv_specs), slope=slope, seq_len=t,
        n_blocks=len(blocks),
    )
    rows = t_tile + 2 * halo
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles, len(blocks)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_tile, p * c0p), lambda bb, ii, jj: (bb, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_rows, p * c0p), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, p * c0p), compute_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *flat_w)
    return out.reshape(b, t_rows * p, c0p)[:, :t, :c0]
