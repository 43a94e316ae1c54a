"""Block-matrix weight packing for the space-to-depth Pallas kernels.

The packed kernels (hifigan_mrf.py / hifigan_tail.py) turn every conv tap
into a block of a dense (lanes, lanes) matrix indexed by (input phase,
output phase, tap). Weights are jit *arguments*, so the packing runs on
device on every call (XLA hoists it out of scan/fori_loop bodies, but a
plain decode call pays it). Two formulations were measured on v5e:

  * ``.at[block].set(w[kk])`` loops — one dynamic-update-slice per tap
    block; hundreds of tiny serialized ops, but XLA handles them well
    when hoistable.
  * flat gather ``w_flat[idx]`` — one op per weight, but TPU gathers of
    (n, 128, 128) int32 index maps are slow (5x regression on the
    hifigan tail bench).

The winner is a dense contraction with a static one-hot placement
tensor: pad taps to the lane-padded channel block, then

  packed[s, j_in, ci, j_out, co] = sum_k S[s, j_in, j_out, k] * w[k, ci, co]

where ``S`` is a {0,1} constant of shape (n_mats, p_in, p_out, K). One
MXU-friendly einsum per weight tensor, no scatter/gather at all.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def pack_block_weights(entries_by_mat, w, c0p_in: int, c0p_out: int,
                       lanes: int = 128):
    """taps ``w (K, Cin, Cout)`` -> ``(n_mats, lanes, lanes)`` block mats.

    ``entries_by_mat``: iterable over output matrices, each a list of
    ``(j_in, j_out, kk)`` placements of tap ``w[kk]`` at block
    ``[j_in*c0p_in : +Cin, j_out*c0p_out : +Cout]``. Placements within
    one matrix must not overlap (true for conv/deconv shift tables: a
    (j_in, j_out) block pair determines the tap uniquely).
    """
    entries_by_mat = list(entries_by_mat)
    k, cin, cout = w.shape
    n = len(entries_by_mat)
    p_in, p_out = lanes // c0p_in, lanes // c0p_out
    sel = np.zeros((n, p_in, p_out, k), np.float32)
    for si, entries in enumerate(entries_by_mat):
        for j_in, j_out, kk in entries:
            sel[si, j_in, j_out, kk] = 1.0
    wp = jnp.pad(
        w.astype(jnp.float32), ((0, 0), (0, c0p_in - cin), (0, c0p_out - cout))
    )
    # precision=HIGHEST keeps the one-hot contraction lossless on TPU:
    # preferred_element_type only fixes the accumulator dtype, and default
    # MXU precision would round the inputs to bf16 (~2e-3 relative).
    packed = jnp.einsum(
        "siok,kab->siaob", jnp.asarray(sel), wp,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return packed.reshape(n, lanes, lanes).astype(w.dtype)


def pack_block_bias(b, p_out: int, c0p_out: int, lanes: int = 128):
    """bias ``(Cout,)`` -> ``(lanes,)`` with a copy at every output phase."""
    cout = b.shape[0]
    bp = jnp.pad(b, (0, c0p_out - cout))
    out = jnp.tile(bp, p_out)
    if out.shape[0] < lanes:
        out = jnp.pad(out, (0, lanes - out.shape[0]))
    return out
