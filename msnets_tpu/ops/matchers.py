"""TPU-native matching-cost ops (JAX/XLA formulations).

These are device-side, jittable re-designs of the reference's CPU kernels
(reference: src/cpp/matchers/matchers.cpp). Rather than translating the
OpenMP/SSE integral-image code, each cost is expressed as dense vectorized
array ops that XLA fuses and tiles for the VPU/MXU:

  * census  - descriptors bit-packed into 4 x uint32 lanes, Hamming distance
              via XOR + ``lax.population_count`` over the disparity axis
              (semantics of matchers.cpp:232-353)
  * ncc     - windowed NCC from box-filtered moments. The reference uses
              double-precision integral images (matchers.cpp:125-212); here
              all moment terms are integer-valued and < 2^24 so float32
              arithmetic is exact; only rsqrt/multiply rounding differs.
  * zsad    - zero-mean SAD accumulated over the 25 static window offsets
              (matchers.cpp:442-512)
  * sadsob  - box filter of |sobel_L - shift(sobel_R, d)| (matchers.cpp:356-438)
  * sobel   - 3x3 horizontal Sobel (matchers.cpp:515-554)

All ops reproduce the reference's valid-region semantics: windows iterate
``i < H - w`` (one short of the full range), costs exist only for
``d <= col - wc``, and invalid entries hold ``INVALID`` (float32(RAND_MAX))
so the downstream clip/AML stages behave identically.

Layout: everything here is centre-aligned [H, W] -> [H, W, D] (the
reference's post-``swap_axes`` layout). D innermost is also the natural TPU
lane dimension for the AML softmax that follows.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INVALID

_NEG = -1  # marker for masked gather


def _shift_idx(W: int, ndisp: int):
    """Column gather indices j-d as [W, D] plus validity mask."""
    j = jnp.arange(W)[:, None]
    d = jnp.arange(ndisp)[None, :]
    idx = j - d
    return jnp.clip(idx, 0, W - 1), idx >= 0


def shifted_over_disp(x: jnp.ndarray, ndisp: int, fill=0.0) -> jnp.ndarray:
    """[H, W] -> [H, W, D] with out[:, j, d] = x[:, j-d] (``fill`` if j < d).

    Lowered as D static pad/slice ops stacked on the minor axis rather than
    a gather with computed indices — slices fuse into the consuming stencil
    loops (the zsad formulation's measured choice, and bench-neutral-or-
    better for the other matchers)."""
    H, W = x.shape
    cols = []
    for d in range(ndisp):
        if d == 0:
            cols.append(x)
        elif d < W:
            cols.append(jnp.pad(x[:, :W - d], ((0, 0), (d, 0)),
                                constant_values=fill))
        else:
            cols.append(jnp.full_like(x, fill))
    return jnp.stack(cols, axis=-1)


def _box_valid(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Separable VALID box sum over leading two axes of [H, W, ...].

    Implemented as w-1 shift-adds per axis (pure VPU, exact fp32 adds) —
    NOT as a convolution: TPU fp32 convs default to bf16 MXU multiplies,
    which would destroy the integer-exact moment arithmetic the NCC/ZSAD
    formulations rely on, and a ones-kernel conv wastes the MXU anyway.
    """
    def sum_axis(a, axis):
        out = jax.lax.slice_in_dim(a, 0, a.shape[axis] - w + 1, axis=axis)
        for i in range(1, w):
            out = out + jax.lax.slice_in_dim(a, i, a.shape[axis] - w + 1 + i,
                                             axis=axis)
        return out
    return sum_axis(sum_axis(x, 0), 1)


def _centre_pad(v: jnp.ndarray, H: int, W: int, wc: int) -> jnp.ndarray:
    """Place a valid-window result at centre coordinates inside [H, W, ...]."""
    pads = [(wc, H - v.shape[0] - wc), (wc, W - v.shape[1] - wc)]
    pads += [(0, 0)] * (v.ndim - 2)
    return jnp.pad(v, pads)


def _valid_mask(H: int, W: int, ndisp: int, w: int) -> np.ndarray:
    """Reference valid-region mask [H, W, D]: rows [wc, H-w+wc), cols
    [wc, W-w+wc), and d <= c - wc."""
    wc = w // 2
    r = np.arange(H)[:, None, None]
    c = np.arange(W)[None, :, None]
    d = np.arange(ndisp)[None, None, :]
    return ((r >= wc) & (r < H - w + wc)
            & (c >= wc) & (c < W - w + wc)
            & (d <= c - wc))


# ---------------------------------------------------------------------------
# census
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3))
def census(iml: jnp.ndarray, imr: jnp.ndarray, ndisp: int, wsize: int = 11) -> jnp.ndarray:
    """Census Hamming cost volume [H, W, D] (float32).

    Descriptor bit k at centre (r, c): ``centre < window_k`` over the
    row-major wsize x wsize window (centre included, always 0). Bits are
    packed into ceil(w^2 / 32) uint32 words; Hamming distance is
    popcount(xor) summed over words.
    """
    H, W = iml.shape
    wc = wsize // 2
    nbits = wsize * wsize
    nwords = (nbits + 31) // 32

    def descriptors(img):
        img = img.astype(jnp.int32)
        centre = img
        words = []
        bit_in_word = 0
        acc = jnp.zeros((H, W), jnp.uint32)
        for dy in range(-wc, wc + 1):
            for dx in range(-wc, wc + 1):
                # neighbour value at (r+dy, c+dx); out-of-range rows/cols are
                # masked later by the valid-region mask, so clamp is fine.
                nb = jnp.roll(img, (-dy, -dx), axis=(0, 1))
                bit = (centre < nb).astype(jnp.uint32)
                acc = acc | (bit << np.uint32(bit_in_word))
                bit_in_word += 1
                if bit_in_word == 32:
                    words.append(acc)
                    acc = jnp.zeros((H, W), jnp.uint32)
                    bit_in_word = 0
        if bit_in_word:
            words.append(acc)
        return jnp.stack(words, axis=-1)          # [H, W, nwords]

    dl = descriptors(iml)
    dr = descriptors(imr)
    # shifted right descriptors as D static pad/slices (not a gather): the
    # per-d XOR/popcount/word-sum ops fuse into one stencil pass instead of
    # materializing the [H, W, D, nwords] gathered intermediate. Shifted-off
    # columns (j < d) hold zero descriptors; the valid mask overwrites them.
    cols = []
    for d in range(ndisp):
        if d == 0:
            s = dr
        elif d < W:
            s = jnp.pad(dr[:, :W - d], ((0, 0), (d, 0), (0, 0)))
        else:
            s = jnp.zeros_like(dr)
        cols.append(jax.lax.population_count(dl ^ s).sum(-1))
    cost = jnp.stack(cols, axis=-1).astype(jnp.float32)
    mask = jnp.asarray(_valid_mask(H, W, ndisp, wsize))
    return jnp.where(mask, cost, INVALID)


# ---------------------------------------------------------------------------
# sobel
# ---------------------------------------------------------------------------

@jax.jit
def sobel(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 horizontal Sobel, float32, zero border; drops last valid row/col
    exactly like the reference (matchers.cpp:538-548)."""
    H, W = img.shape
    x = img.astype(jnp.float32)
    # shift-add cross-correlation with [[-1,0,1],[-2,0,2],[-1,0,1]] (VPU only)
    col = lambda r, c: x[r:H - 2 + r, c:W - 2 + c]
    v = (-col(0, 0) + col(0, 2) - 2.0 * col(1, 0) + 2.0 * col(1, 2)
         - col(2, 0) + col(2, 2))
    v = v[: H - 3, : W - 3]
    out = jnp.zeros((H, W), jnp.float32)
    return out.at[1:H - 2, 1:W - 2].set(v)


# ---------------------------------------------------------------------------
# ncc
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3))
def ncc_nister(iml: jnp.ndarray, imr: jnp.ndarray, ndisp: int, wsize: int = 3) -> jnp.ndarray:
    """Windowed NCC cost [H, W, D] (centre-aligned; the reference's
    [D, H, W] after its swap_axes). cost = -(n*S_lr - A_l*A_r) * C_l * C_r,
    C = rsqrt(n*B - A^2); non-finite C -> 1."""
    H, W = iml.shape
    wc = wsize // 2
    n = float(wsize * wsize)
    L = iml.astype(jnp.float32)
    R = imr.astype(jnp.float32)

    def stats(img):
        A = _centre_pad(_box_valid(img, wsize), H, W, wc)
        B = _centre_pad(_box_valid(img * img, wsize), H, W, wc)
        var = n * B - A * A
        # var == 0 (flat window) -> C = inf in the reference; track finiteness
        C = jnp.where(var > 0, jax.lax.rsqrt(jnp.maximum(var, 1e-30)), jnp.inf)
        return A, C

    Al, Cl = stats(L)
    Ar, Cr = stats(R)
    Rs = shifted_over_disp(R, ndisp)                       # [H, W, D]
    prod = L[:, :, None] * Rs
    S = _centre_pad(_box_valid(prod, wsize), H, W, wc)     # n-window sum of L*R_d
    # slice-form shifts (see shifted_over_disp); shifted-off columns only
    # exist outside the valid mask. Cr fill = inf marks them non-finite.
    Ar_s = shifted_over_disp(Ar, ndisp)
    Cr_s = shifted_over_disp(Cr, ndisp, fill=np.inf)
    val = -(n * S - Al[:, :, None] * Ar_s) * Cl[:, :, None] * Cr_s
    finite = jnp.isfinite(Cl)[:, :, None] & jnp.isfinite(Cr_s)
    val = jnp.where(finite, val, 1.0)
    mask = jnp.asarray(_valid_mask(H, W, ndisp, wsize))
    return jnp.where(mask, val, INVALID)


# ---------------------------------------------------------------------------
# zsad
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3))
def zsad(iml: jnp.ndarray, imr: jnp.ndarray, ndisp: int, wsize: int = 5) -> jnp.ndarray:
    """Zero-mean SAD cost [H, W, D] (centre-aligned).

    cost(r, c, d) = sum_{u,v} |L[r+u, c+v] - R[r+u, c+v-d] - K_d[r, c]|
    with K_d = muL(r, c) - muR(r, c-d); mu = window mean at the centre.
    The |.| couples the per-centre constant K with the window sum, so this is
    not a plain box filter; we accumulate the w^2 static offsets, which XLA
    fuses into a single VPU loop.
    """
    H, W = iml.shape
    wc = wsize // 2
    n = float(wsize * wsize)
    L = iml.astype(jnp.float32)
    R = imr.astype(jnp.float32)

    def mean(img):
        return _centre_pad(_box_valid(img, wsize) / n, H, W, wc)

    muL, muR = mean(L), mean(R)
    muR_s = shifted_over_disp(muR, ndisp)
    K = muL[:, :, None] - muR_s                          # [H, W, D]
    T = L[:, :, None] - shifted_over_disp(R, ndisp)      # [H, W, D]

    # static slices of one zero-padded buffer (NOT jnp.roll: 25 rolls
    # materialize 25 [H,W,D] copies; 25 slice-views of Tp fuse into a
    # single stencil loop). Border values differ from the roll/wrap
    # formulation only inside the wc margin, which the mask invalidates.
    Tp = jnp.pad(T, ((wc, wc), (wc, wc), (0, 0)))
    cost = jnp.zeros((H, W, ndisp), jnp.float32)
    for u in range(wsize):
        for v in range(wsize):
            Ts = jax.lax.slice(Tp, (u, v, 0), (u + H, v + W, ndisp))
            cost = cost + jnp.abs(Ts - K)
    mask = jnp.asarray(_valid_mask(H, W, ndisp, wsize))
    return jnp.where(mask, cost, INVALID)


# ---------------------------------------------------------------------------
# sadsob
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3))
def sadsob(sobl: jnp.ndarray, sobr: jnp.ndarray, ndisp: int, wsize: int = 5) -> jnp.ndarray:
    """SAD over Sobel maps [H, W, D] (centre-aligned): box filter of
    |sobL - shift(sobR, d)| with zeros where the shift runs off the edge."""
    H, W = sobl.shape
    wc = wsize // 2
    diff = jnp.abs(sobl[:, :, None] - shifted_over_disp(sobr, ndisp))
    # zero out j < d (shift ran off the image) to mirror the integral image
    _, ok = _shift_idx(W, ndisp)
    diff = jnp.where(ok[None], diff, 0.0)
    s = _centre_pad(_box_valid(diff, wsize), H, W, wc)
    mask = jnp.asarray(_valid_mask(H, W, ndisp, wsize))
    return jnp.where(mask, s, INVALID)


# ---------------------------------------------------------------------------
# confidence measures
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("axis",))
def extract_aml(vol: jnp.ndarray, sigma: float, axis: int = -1) -> jnp.ndarray:
    """AML confidence: masked softmax of -(c - c_min)^2 / sigma over ``axis``.

    One fused VPU pass (min, exp, sum, divide); rows whose minimum is the
    INVALID sentinel yield all-zero likelihoods (featextract.cpp:415-462).
    """
    mn = jnp.min(vol, axis=axis, keepdims=True)
    num = vol - mn
    w = jnp.exp(-(num * num) / sigma)
    p = w / jnp.sum(w, axis=axis, keepdims=True)
    return jnp.where(mn >= INVALID, 0.0, p)


@functools.partial(jax.jit, static_argnames=("axis",))
def extract_pkrn(vol: jnp.ndarray, e: float, axis: int = -1) -> jnp.ndarray:
    """PKRN peak-ratio confidence (featextract.cpp:272-356)."""
    mn = jnp.min(vol, axis=axis, keepdims=True)
    r = (mn + e) / (vol + e)
    return jnp.where(mn >= INVALID, 0.0, r)


# ---------------------------------------------------------------------------
# view re-indexing (featextract.cpp get_right_cost / get_left_cost)
# ---------------------------------------------------------------------------

@jax.jit
def get_right_cost(cost_hwd: jnp.ndarray) -> jnp.ndarray:
    """R[i, j, d] = L[i, j+d, d]; out-of-range filled with cost[0,0,0].

    Per-d static slices (not a per-pixel gather) — the same fusing
    formulation as shifted_over_disp, just shifting each d-plane the other
    way."""
    H, W, D = cost_hwd.shape
    fill = cost_hwd[0, 0, 0]
    cols = []
    for d in range(D):
        s = cost_hwd[:, d:, d] if d < W else cost_hwd[:, :0, 0]
        pad = jnp.broadcast_to(fill, (H, min(d, W)))
        cols.append(jnp.concatenate([s, pad], axis=1) if d else s)
    return jnp.stack(cols, axis=-1)


@jax.jit
def get_left_cost(cost_hwd: jnp.ndarray) -> jnp.ndarray:
    """L[i, j, d] = R[i, j-d, d]; out-of-range filled with cost[0,0,0]."""
    H, W, D = cost_hwd.shape
    fill = cost_hwd[0, 0, 0]
    cols = []
    for d in range(D):
        s = cost_hwd[:, :W - d, d] if d < W else cost_hwd[:, :0, 0]
        pad = jnp.broadcast_to(fill, (H, min(d, W)))
        cols.append(jnp.concatenate([pad, s], axis=1) if d else s)
    return jnp.stack(cols, axis=-1)
