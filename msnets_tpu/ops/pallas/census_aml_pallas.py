"""Fused census+AML Pallas TPU kernel (the VERDICT r2 #4 bounded experiment).

The XLA path materializes, per image pair:
  * the gathered right-descriptor intermediate [H, W, D, 4] uint32
  * the census cost volume [H, W, D] f32 (read again by clip and by AML)
  * AML's exp weights before normalization

This kernel computes BOTH feature channels of the census matcher — the
normalized cost ``clip(c, 0, 120)/120`` and the AML likelihood
``exp(-(c-min)^2/sigma) / sum`` (reference featextract.cpp:415-462 semantics,
ops/matchers.py:extract_aml) — in one VMEM pass per row tile. HBM traffic is
just the two packed descriptor images in (~1.4 MB) and the two output
channels; the cost volume lives in a VMEM scratch.

Differences from round-2's census-only kernel (14x slower than XLA, D-unroll
overwhelmed the remote compiler): the disparity loop is a ``fori_loop`` with
dynamic-start loads from a left-padded descriptor buffer (no unroll, no
per-chunk HBM pre-shift), and the AML fusion amortizes the descriptor reads
across two channels.

Layout: outputs are [D, H, W] (D-major grid writes); the caller transposes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import INVALID
from .census_pallas import _pack_descriptors


def _kernel(dl_ref, drp_ref, cost_ref, aml_ref, scratch_ref, *,
            ndisp: int, nwords: int, wsize: int, sigma: float,
            H: int, row_tile: int):
    """dl: [Th, W, NW]; drp: [Th, W + D, NW] (D zeros padded on the LEFT so
    a dynamic-start slice implements the disparity shift); outputs
    [D, Th, W]; scratch [D, Th, W] f32 holds the masked cost volume."""
    Th, W, _ = dl_ref.shape
    wc = wsize // 2
    i = pl.program_id(0)

    rows = i * row_tile + jax.lax.broadcasted_iota(jnp.int32, (Th, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Th, W), 1)
    row_ok = (rows >= wc) & (rows < H - wsize + wc)
    col_ok = (cols >= wc) & (cols < W - wsize + wc)

    def ham_at(d):
        acc = jnp.zeros((Th, W), jnp.int32)
        for k in range(nwords):          # nwords = 4: tiny static unroll
            dl_k = dl_ref[:, :, k]
            dr_k = drp_ref[:, pl.dslice(ndisp - d, W), k]
            acc = acc + jax.lax.population_count(dl_k ^ dr_k).astype(jnp.int32)
        cost = acc.astype(jnp.float32)
        ok = row_ok & col_ok & (d <= cols - wc)
        return jnp.where(ok, cost, INVALID)

    def pass1(d, mn):
        c = ham_at(d)
        scratch_ref[d] = c
        return jnp.minimum(mn, c)

    mn = jax.lax.fori_loop(0, ndisp, pass1,
                           jnp.full((Th, W), INVALID, jnp.float32))

    def pass2(d, s):
        c = scratch_ref[d]
        num = c - mn
        w = jnp.exp(-(num * num) / sigma)
        scratch_ref[d] = w
        return s + w

    s = jax.lax.fori_loop(0, ndisp, pass2, jnp.zeros((Th, W), jnp.float32))

    invalid_row = mn >= INVALID

    def pass3(d, _):
        w = scratch_ref[d]
        aml_ref[d] = jnp.where(invalid_row, 0.0, w / s)
        # recover cost from the exp weight? cheaper to recompute the clip
        # channel from the Hamming distance directly:
        c = ham_at(d)
        cost_ref[d] = jnp.clip(c, 0.0, 120.0) / 120.0
        return 0

    jax.lax.fori_loop(0, ndisp, pass3, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def census_aml_pallas(iml: jnp.ndarray, imr: jnp.ndarray, ndisp: int,
                      wsize: int = 11, sigma: float = 128.0,
                      row_tile: int = 8,
                      interpret: bool = False):
    """Fused census channels: (clip(c,0,120)/120, AML(c, sigma)), each
    [H, W, D] f32 — numerics identical to
    ``clip(matchers.census(...))`` / ``extract_aml(matchers.census(...))``.
    """
    H, W = iml.shape
    nwords = (wsize * wsize + 31) // 32
    dl = _pack_descriptors(iml, wsize)
    dr = _pack_descriptors(imr, wsize)
    drp = jnp.pad(dr, ((0, 0), (ndisp, 0), (0, 0)))    # left zero-pad by D

    Hp = ((H + row_tile - 1) // row_tile) * row_tile
    if Hp != H:
        dl = jnp.pad(dl, ((0, Hp - H), (0, 0), (0, 0)))
        drp = jnp.pad(drp, ((0, Hp - H), (0, 0), (0, 0)))

    grid = (Hp // row_tile,)
    cost, aml = pl.pallas_call(
        functools.partial(_kernel, ndisp=ndisp, nwords=nwords, wsize=wsize,
                          sigma=sigma, H=H, row_tile=row_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, W, nwords), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, W + ndisp, nwords), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ndisp, row_tile, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ndisp, row_tile, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((ndisp, Hp, W), jnp.float32),
                   jax.ShapeDtypeStruct((ndisp, Hp, W), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((ndisp, row_tile, W), jnp.float32)],
        interpret=interpret,
    )(dl, drp)
    to_hwd = lambda v: jnp.transpose(v[:, :H, :], (1, 2, 0))
    return to_hwd(cost), to_hwd(aml)
