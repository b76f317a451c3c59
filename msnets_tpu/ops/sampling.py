"""CBMV random-forest training-sample utilities.

Parity with the remaining libfeatextract surface (reference:
src/cpp/featextract/featextract.cpp:107-270, 501-526). These support the
original CBMV random-forest workflow (per-pixel positive/negative disparity
sampling); the MS-Nets training path does not use them, but they are part of
the library surface (SURVEY.md §2.1).
"""
from __future__ import annotations

import numpy as np


def generate_d_indices(gt: np.ndarray, maxd: int, disp_thresh: int,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Per-pixel (gt, neg1, neg2) disparity triplets [N, 3] int32.

    For each ground-truth disparity, draw two negatives outside
    [gt - thresh, gt + thresh] — one below when possible, one above when
    possible, falling back to the other side (featextract.cpp:194-229).
    """
    rng = rng or np.random.default_rng()
    gt = np.asarray(gt, np.int64).reshape(-1)
    assert (gt >= 0).all() and (gt <= maxd).all()
    n = gt.shape[0]
    out = np.zeros((n, 3), np.int32)
    out[:, 0] = gt
    low_ok = gt - disp_thresh > 0
    high_ok = gt + disp_thresh < maxd
    # each negative is an INDEPENDENT draw, even when both fall back to the
    # same side (the reference calls rand() separately per negative,
    # featextract.cpp:213-225 — a shared draw would emit duplicated
    # negatives for every low-gt pixel). The high-side span maxd-(gt+t+1)
    # never yields maxd itself — reference parity (rand % span + gt+t+1
    # tops out at maxd-1); the max(.., 1) clamp only avoids the reference's
    # rand%0 UB at gt+t == maxd-1.
    lo_span = np.maximum(gt - disp_thresh, 1)
    hi_span = np.maximum(maxd - (gt + disp_thresh + 1), 1)
    lo1 = (rng.random(n) * lo_span).astype(np.int64)
    lo2 = (rng.random(n) * lo_span).astype(np.int64)
    hi1 = (rng.random(n) * hi_span).astype(np.int64) + gt + disp_thresh + 1
    hi2 = (rng.random(n) * hi_span).astype(np.int64) + gt + disp_thresh + 1
    out[:, 1] = np.where(low_ok, lo1, hi1)
    out[:, 2] = np.where(high_ok, hi2, lo2)
    return out


def get_samples(vol: np.ndarray, r_samp: np.ndarray) -> np.ndarray:
    """Gather cost values at sampled disparities: vol [N, D], r_samp [N, 3]
    -> [N*3] float32 (featextract.cpp:236-270)."""
    vol = np.asarray(vol, np.float32)
    idx = np.asarray(r_samp, np.int64)
    return np.take_along_axis(vol, idx, axis=1).reshape(-1)


def generate_labels(r_samp: np.ndarray) -> np.ndarray:
    """[1, 0, 0] per sampled triplet (featextract.cpp:501-526)."""
    n = np.asarray(r_samp).shape[0]
    out = np.zeros((n, 3), np.int32)
    out[:, 0] = 1
    return out.reshape(-1)


def get_cost(vol_4d: np.ndarray) -> np.ndarray:
    """Slice channel 0 of a 4-D volume (legacy CBMV helper,
    featextract.cpp:107-134): [A, B, C, D] -> [A, B, C] of element 0."""
    return np.ascontiguousarray(np.asarray(vol_4d)[:, :, :, 0], np.float32)
