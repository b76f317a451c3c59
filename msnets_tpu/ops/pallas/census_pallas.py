"""Pallas TPU kernel for the census Hamming cost volume.

The XLA formulation (ops/matchers.py:census) materializes a gathered
[H, W, D, 4]-uint32 intermediate (~184 MB at KITTI eval sizes) before the
XOR/popcount reduction. This kernel streams row tiles of the bit-packed
descriptors through VMEM and emits the [D, H, W] cost volume directly:
HBM traffic drops to the two descriptor images (~8 MB) plus the output.

Layout notes:
  * descriptors are packed by XLA bit-ops outside the kernel (cheap,
    elementwise) into [H, W, NW] uint32, NW = ceil(w^2/32)
  * output is D-major [D, H, W] so each unrolled disparity writes one
    contiguous [Th, W] lane tile; the caller transposes/masks as needed
    (the AML stage that follows reduces over D and is layout-agnostic)
  * the disparity shift becomes a W-axis slice + left zero-pad in VMEM
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import INVALID
from ..matchers import _valid_mask


def _pack_descriptors(img: jnp.ndarray, wsize: int) -> jnp.ndarray:
    """Census descriptors packed into uint32 words, [H, W, NW]."""
    H, W = img.shape
    wc = wsize // 2
    nbits = wsize * wsize
    nwords = (nbits + 31) // 32
    x = img.astype(jnp.int32)
    words = []
    acc = jnp.zeros((H, W), jnp.uint32)
    bit = 0
    for dy in range(-wc, wc + 1):
        for dx in range(-wc, wc + 1):
            nb = jnp.roll(x, (-dy, -dx), axis=(0, 1))
            acc = acc | ((x < nb).astype(jnp.uint32) << np.uint32(bit))
            bit += 1
            if bit == 32:
                words.append(acc)
                acc = jnp.zeros((H, W), jnp.uint32)
                bit = 0
    if bit:
        words.append(acc)
    return jnp.stack(words, axis=-1)


def _census_kernel(dl_ref, dr_ref, out_ref, *, d_chunk: int, nwords: int):
    # dl: [Th, W, NW]; dr: [1, Th, W, NW] (pre-shifted by this chunk's base
    # disparity); out: [d_chunk, Th, W] float32
    W = dl_ref.shape[1]
    for k in range(nwords):
        dl_k = dl_ref[:, :, k]
        dr_k = dr_ref[0, :, :, k]
        for d in range(d_chunk):
            if d == 0:
                shifted = dr_k
            elif d < W:
                shifted = jnp.pad(dr_k[:, : W - d], ((0, 0), (d, 0)))
            else:
                shifted = jnp.zeros_like(dr_k)
            # Mosaic can't cast uint32 -> float32 directly; go via int32
            ham = jax.lax.population_count(dl_k ^ shifted).astype(
                jnp.int32).astype(jnp.float32)
            if k == 0:
                out_ref[d] = ham
            else:
                out_ref[d] += ham


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def census_pallas(iml: jnp.ndarray, imr: jnp.ndarray, ndisp: int,
                  wsize: int = 11, row_tile: int = 8,
                  d_chunk: int = 16) -> jnp.ndarray:
    """Census cost volume [H, W, D], numerics identical to matchers.census.

    The disparity axis is processed in ``d_chunk``-wide grid steps: the
    right descriptors are pre-shifted once per chunk outside the kernel
    (cheap elementwise pad/slice, [D/chunk, H, W, NW] HBM), so every
    in-kernel shift stays a static slice while the per-invocation unroll
    drops from D*NW to chunk*NW ops — a fully unrolled D=96 kernel
    overwhelmed the remote TPU compiler.
    """
    H, W = iml.shape
    nbits = wsize * wsize
    nwords = (nbits + 31) // 32
    d_chunk = min(d_chunk, ndisp)
    nchunks = (ndisp + d_chunk - 1) // d_chunk
    ndisp_p = nchunks * d_chunk
    dl = _pack_descriptors(iml, wsize)
    dr = _pack_descriptors(imr, wsize)

    # pad rows to a tile multiple
    Hp = ((H + row_tile - 1) // row_tile) * row_tile
    if Hp != H:
        dl = jnp.pad(dl, ((0, Hp - H), (0, 0), (0, 0)))
        dr = jnp.pad(dr, ((0, Hp - H), (0, 0), (0, 0)))

    # pre-shift dr by each chunk's base disparity: dr_s[c, :, j] = dr[:, j - c*d_chunk]
    def shift(c):
        s = c * d_chunk
        if s == 0:
            return dr
        if s >= W:
            return jnp.zeros_like(dr)
        return jnp.pad(dr[:, : W - s], ((0, 0), (s, 0), (0, 0)))

    dr_s = jnp.stack([shift(c) for c in range(nchunks)], axis=0)

    grid = (nchunks, Hp // row_tile)
    out = pl.pallas_call(
        functools.partial(_census_kernel, d_chunk=d_chunk, nwords=nwords),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, W, nwords), lambda c, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile, W, nwords), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_chunk, row_tile, W), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ndisp_p, Hp, W), jnp.float32),
    )(dl, dr_s)

    cost = jnp.transpose(out[:ndisp, :H, :], (1, 2, 0))     # [H, W, D]
    mask = jnp.asarray(_valid_mask(H, W, ndisp, wsize))
    return jnp.where(mask, cost, INVALID)
