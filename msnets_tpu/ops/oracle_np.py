"""Pure-NumPy oracle for the matching-space cost kernels.

This module is a clean-room re-implementation of the *semantics* of the
reference C++ kernels (reference: src/cpp/matchers/matchers.cpp and
src/cpp/featextract/featextract.cpp), used as the golden reference for unit
tests of the JAX/Pallas device ops and of the C++ host oracle.

It deliberately replicates reference quirks so parity is testable:
  * invalid entries filled with float32(RAND_MAX) = 2147483648.0
    (matchers.cpp:65,251,377,462)
  * valid regions iterate ``i < H - wsize`` (NOT ``H - wsize + 1``), dropping
    the last otherwise-computable window row/col (matchers.cpp:134,283,472)
  * disparity validity d <= column - wc (census: matchers.cpp:318;
    ncc/zsad/sadsob: the ``j = d`` loop starts)
  * census Hamming distance over a 121-element descriptor (window 11x11,
    including the centre position, matchers.cpp:267-335)
  * NCC returns -ncc, with non-finite normalizers mapped to cost 1
    (matchers.cpp:196-204)
  * ``get_right_cost`` fills out-of-range entries with the volume's first
    element (featextract.cpp:150-151)

Layout conventions follow the reference: census produces [H, W, D]; ncc,
zsad and sadsob produce [D, H, W] (callers transpose via swap_axes).
"""
from __future__ import annotations

import numpy as np

INVALID = np.float32(2147483648.0)  # float32(RAND_MAX)


def _sliding(img: np.ndarray, w: int) -> np.ndarray:
    """All w x w windows: out[i, j] = img[i:i+w, j:j+w]."""
    return np.lib.stride_tricks.sliding_window_view(img, (w, w))


def census(iml: np.ndarray, imr: np.ndarray, ndisp: int, wsize: int = 11) -> np.ndarray:
    """Census-transform Hamming cost volume, layout [H, W, D].

    Bit k of the descriptor at centre (r, c) is ``centre < window_k`` over the
    row-major wsize*wsize window. Cost(r, c, d) = Hamming(descL(r, c),
    descR(r, c - d)). Matches matchers.cpp:232-353.
    """
    H, W = iml.shape
    wc = wsize // 2
    out = np.full((H, W, ndisp), INVALID, dtype=np.float32)

    def desc(img):
        win = _sliding(img.astype(np.int16), wsize)          # [H-w+1, W-w+1, w, w]
        centre = img[wc:H - wsize + 1 + wc, wc:W - wsize + 1 + wc].astype(np.int16)
        bits = win > centre[:, :, None, None]                # centre < neighbour
        # reference computes only i < H-w, j < W-w (drops last window row/col)
        return bits[: H - wsize, : W - wsize].reshape(H - wsize, W - wsize, -1)

    dl, dr = desc(iml), desc(imr)
    nrows, ncols = dl.shape[:2]
    for d in range(ndisp):
        if d >= ncols:
            break
        # valid source cols j >= d  (d <= j)
        ham = (dl[:, d:] != dr[:, : ncols - d]).sum(-1).astype(np.float32)
        out[wc:wc + nrows, wc + d:wc + ncols, d] = ham
    return out


def sobel(img: np.ndarray) -> np.ndarray:
    """Horizontal 3x3 Sobel on uint8, float32 out, zero border.

    Matches matchers.cpp:515-554 including the dropped last row/col
    (loop bound ``i < H-3``).
    """
    H, W = img.shape
    k = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
    win = _sliding(img.astype(np.float32), 3)                # [H-2, W-2, 3, 3]
    vc = np.einsum("ijkl,kl->ij", win, k)
    out = np.zeros((H, W), dtype=np.float32)
    out[1:H - 2, 1:W - 2] = vc[: H - 3, : W - 3]
    return out


def _box_sum(a: np.ndarray, w: int) -> np.ndarray:
    """Sum over all w x w windows (float64). out[i, j] = sum a[i:i+w, j:j+w]."""
    return _sliding(a.astype(np.float64), w).sum((-1, -2))


def ncc_nister(iml: np.ndarray, imr: np.ndarray, ndisp: int, wsize: int = 3) -> np.ndarray:
    """Windowed NCC cost (negated), layout [D, H, W]. Matches matchers.cpp:47-228.

    cost = -(n*sum(LR) - A_l*A_r) * C_l * C_r  with  C = 1/sqrt(n*B - A^2),
    where A/B are window sums / sums-of-squares. Non-finite C -> cost 1.
    """
    H, W = iml.shape
    wc = wsize // 2
    n = wsize * wsize
    L = iml.astype(np.float64)
    R = imr.astype(np.float64)

    def stats(img):
        A = _box_sum(img, wsize)                             # [H-w+1, W-w+1]
        B = _box_sum(img * img, wsize)
        with np.errstate(divide="ignore", invalid="ignore"):
            C = 1.0 / np.sqrt(n * B - A * A)
        return A, C

    Al, Cl = stats(L)
    Ar, Cr = stats(R)
    out = np.full((ndisp, H, W), INVALID, dtype=np.float32)
    nrows = H - wsize                                        # reference drops last row
    ncols = W - wsize
    for d in range(ndisp):
        if d >= ncols:
            break
        prod = np.zeros((H, W), dtype=np.float64)
        prod[:, d:] = L[:, d:] * R[:, : W - d]
        lD = _box_sum(prod, wsize)                           # window starting at (i, j)
        # valid: i in [0, nrows), j in [d, ncols)
        i_sl = slice(0, nrows)
        j_sl = slice(d, ncols)
        cl = Cl[i_sl, j_sl]
        cr = Cr[i_sl, slice(0, ncols - d)]
        al = Al[i_sl, j_sl]
        ar = Ar[i_sl, slice(0, ncols - d)]
        with np.errstate(invalid="ignore"):
            val = -(n * lD[i_sl, j_sl] - al * ar) * cl * cr
        finite = np.isfinite(cl) & np.isfinite(cr)
        val = np.where(finite, val, 1.0)
        out[d, wc:wc + nrows, wc + d:wc + ncols] = val.astype(np.float32)
    return out


def zsad(iml: np.ndarray, imr: np.ndarray, ndisp: int, wsize: int = 5) -> np.ndarray:
    """Zero-mean SAD cost, layout [D, H, W]. Matches matchers.cpp:442-512.

    cost(d, r, c) = sum_{window} |L - muL(r, c) - R_shift + muR(r, c-d)|
    where mu are window means taken at the *centre* pixel.
    """
    H, W = iml.shape
    wc = wsize // 2
    n = wsize * wsize
    L = iml.astype(np.float32)
    R = imr.astype(np.float32)

    def mean(img):
        m = np.zeros((H, W), dtype=np.float32)
        s = _box_sum(img, wsize).astype(np.float32) / n
        m[wc:wc + H - wsize, wc:wc + W - wsize] = s[: H - wsize, : W - wsize]
        return m

    muL, muR = mean(L), mean(R)
    out = np.full((ndisp, H, W), INVALID, dtype=np.float32)
    nrows = H - wsize
    ncols = W - wsize
    win_l = _sliding(L, wsize)                               # [H-w+1, W-w+1, w, w]
    win_r = _sliding(R, wsize)
    for d in range(ndisp):
        if d >= ncols:
            break
        # centres r=i+wc (i<nrows), c=j+wc (d<=j<ncols)
        wl = win_l[:nrows, d:ncols]
        wr = win_r[:nrows, 0:ncols - d]
        kl = muL[wc:wc + nrows, wc + d:wc + ncols]
        kr = muR[wc:wc + nrows, wc:wc + ncols - d]
        diff = np.abs(wl - wr - (kl - kr)[:, :, None, None])
        out[d, wc:wc + nrows, wc + d:wc + ncols] = diff.sum((-1, -2), dtype=np.float64).astype(np.float32)
    return out


def sadsob(sobl: np.ndarray, sobr: np.ndarray, ndisp: int, wsize: int = 5) -> np.ndarray:
    """SAD over Sobel maps, layout [D, H, W]. Matches matchers.cpp:356-438.

    Box-filter of |sobL - shift(sobR, d)| (zeros where the shift runs off the
    left edge). The reference uses float32 integral images; we use float64
    direct sums (strictly more accurate), so comparisons against the C++
    oracle need a small tolerance.
    """
    H, W = sobl.shape
    wc = wsize // 2
    out = np.full((ndisp, H, W), INVALID, dtype=np.float32)
    nrows = H - wsize
    ncols = W - wsize
    L = sobl.astype(np.float64)
    R = sobr.astype(np.float64)
    for d in range(ndisp):
        if d >= ncols:
            break
        diff = np.zeros((H, W), dtype=np.float64)
        diff[:, d:] = np.abs(L[:, d:] - R[:, : W - d])
        s = _box_sum(diff, wsize)
        out[d, wc:wc + nrows, wc + d:wc + ncols] = s[:nrows, d:ncols].astype(np.float32)
    return out


def swap_axes(cost_dhw: np.ndarray) -> np.ndarray:
    """[D, H, W] -> [H, W, D] (featextract.cpp:49-76)."""
    return np.ascontiguousarray(np.transpose(cost_dhw, (1, 2, 0)))


def swap_axes_back(cost_hwd: np.ndarray) -> np.ndarray:
    """[H, W, D] -> [D, H, W] (featextract.cpp:78-105)."""
    return np.ascontiguousarray(np.transpose(cost_hwd, (2, 0, 1)))


def extract_aml(vol: np.ndarray, sigma: float) -> np.ndarray:
    """AML confidence over the last axis of [N, D] (featextract.cpp:415-462).

    p(d) = exp(-(c_d - c_min)^2 / sigma) / sum_d' exp(-(c_d' - c_min)^2 / sigma)
    and 0 everywhere if the row minimum is the INVALID sentinel.
    """
    vol = vol.astype(np.float64)
    mn = vol.min(axis=-1, keepdims=True)
    num = vol - mn
    w = np.exp(-(num * num) / sigma)
    p = w / w.sum(axis=-1, keepdims=True)
    p = np.where(mn >= np.float64(INVALID), 0.0, p)
    return p.astype(np.float32)


def extract_pkrn(vol: np.ndarray, e: float) -> np.ndarray:
    """PKRN peak-ratio confidence over the last axis (featextract.cpp:320-356)."""
    vol = vol.astype(np.float64)
    mn = vol.min(axis=-1, keepdims=True)
    r = (mn + e) / (vol + e)
    r = np.where(mn >= np.float64(INVALID), 0.0, r)
    return r.astype(np.float32)


def get_right_cost(cost_hwd: np.ndarray) -> np.ndarray:
    """Left cost volume [H, W, D] -> right view: R[i,j,d] = L[i, j+d, d].

    Out-of-range entries filled with the volume's first element
    (featextract.cpp:136-172).
    """
    H, W, D = cost_hwd.shape
    out = np.full((H, W, D), cost_hwd.flat[0], dtype=np.float32)
    for d in range(D):
        out[:, : W - d, d] = cost_hwd[:, d:, d]
    return out


def get_left_cost(cost_hwd: np.ndarray) -> np.ndarray:
    """Right cost volume -> left view: L[i,j,d] = R[i, j-d, d]
    (featextract.cpp:464-499)."""
    H, W, D = cost_hwd.shape
    out = np.full((H, W, D), cost_hwd.flat[0], dtype=np.float32)
    for d in range(D):
        out[:, d:, d] = cost_hwd[:, : W - d, d]
    return out


def get_costs(iml, imr, maxdisp=192, censw=11, nccw=3, sadw=5, sobelw=5,
              board_h=10, board_w_left=10, board_w_right=0):
    """Run all four matchers, unify layouts to [H, W, D], trim margins.

    Mirrors cbmv_generator.py:27-79. Returns (census, ncc, sobel_sad, zsad).
    """
    c_cen = census(iml, imr, maxdisp, censw)
    c_ncc = swap_axes(ncc_nister(iml, imr, maxdisp, nccw))
    c_sad = swap_axes(zsad(iml, imr, maxdisp, sadw))
    sl, sr = sobel(iml), sobel(imr)
    c_sob = swap_axes(sadsob(sl, sr, maxdisp, sobelw))
    h_end = -board_h if board_h > 0 else None
    w_end = -board_w_right if board_w_right > 0 else None
    trim = lambda a: np.ascontiguousarray(a[board_h:h_end, board_w_left:w_end, :])
    return trim(c_cen), trim(c_ncc), trim(c_sob), trim(c_sad)


def extract_features_left(census_c, ncc_c, sobel_c, sad_c,
                          cens_sigma=128.0, ncc_sigma=0.02,
                          sad_sigma=20000.0, sobel_sigma=20000.0):
    """Assemble the 8-channel MS feature volume [8, D, H, W]
    (cbmv_generator.py:258-308).

    ch0-3: normalized raw costs; ch4-7: AML likelihoods. Note the reference
    uses sad_sigma for the sobel AML channel (sobel_sigma is dead).
    """
    h, w, ndisp = census_c.shape
    f = np.empty((8, h, w, ndisp), dtype=np.float32)
    f[0] = np.clip(census_c, 0.0, 120.0) / 120.0
    f[1] = (1.0 + np.clip(ncc_c, -1.0, 1.0)) / 2.0
    f[2] = np.clip(sobel_c, 0.0, 2 ** 13) / float(2 ** 13)
    f[3] = np.clip(sad_c, 0.0, 2 ** 13) / float(2 ** 13)
    flat = lambda a: a.reshape(h * w, ndisp)
    f[4] = extract_aml(flat(census_c), cens_sigma).reshape(h, w, ndisp)
    f[5] = extract_aml(flat(ncc_c), ncc_sigma).reshape(h, w, ndisp)
    f[6] = extract_aml(flat(sobel_c), sad_sigma).reshape(h, w, ndisp)  # sad_sigma: parity
    f[7] = extract_aml(flat(sad_c), sad_sigma).reshape(h, w, ndisp)
    return np.ascontiguousarray(f.transpose(0, 3, 1, 2)).astype(np.float32)
