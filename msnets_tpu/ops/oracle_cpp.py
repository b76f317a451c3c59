"""ctypes bindings for the native host oracle (cpp/msnets_oracle.cpp).

Same API surface and layouts as oracle_np (centre-aligned [H, W, D]) but
OpenMP-parallel native code — the golden-parity partner and the CPU
input-pipeline fallback. Build with ``make -C cpp``; ``available()`` reports
whether the shared library is present.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "cpp", "libmsnets_oracle.so")
_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        ci, cl, cf = ctypes.c_int, ctypes.c_long, ctypes.c_float
        lib.msn_sobel.argtypes = [u8p, ci, ci, f32p]
        for name in ("msn_census", "msn_ncc", "msn_zsad"):
            getattr(lib, name).argtypes = [u8p, u8p, ci, ci, ci, ci, f32p]
        lib.msn_sadsob.argtypes = [f32p, f32p, ci, ci, ci, ci, f32p]
        lib.msn_aml.argtypes = [f32p, cl, ci, cf, f32p]
        lib.msn_pkrn.argtypes = [f32p, cl, ci, cf, f32p]
        lib.msn_get_right_cost.argtypes = [f32p, ci, ci, ci, f32p]
        lib.msn_get_left_cost.argtypes = [f32p, ci, ci, ci, f32p]
        lib.msn_num_threads.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def _c(a, dtype):
    return np.ascontiguousarray(a, dtype=dtype)


def sobel(img: np.ndarray) -> np.ndarray:
    H, W = img.shape
    out = np.empty((H, W), np.float32)
    _load().msn_sobel(_c(img, np.uint8), H, W, out)
    return out


def _matcher(name, iml, imr, ndisp, wsize):
    H, W = iml.shape
    out = np.empty((H, W, ndisp), np.float32)
    getattr(_load(), name)(_c(iml, np.uint8), _c(imr, np.uint8),
                           H, W, ndisp, wsize, out)
    return out


def census(iml, imr, ndisp, wsize=11):
    return _matcher("msn_census", iml, imr, ndisp, wsize)


def ncc_nister(iml, imr, ndisp, wsize=3):
    return _matcher("msn_ncc", iml, imr, ndisp, wsize)


def zsad(iml, imr, ndisp, wsize=5):
    return _matcher("msn_zsad", iml, imr, ndisp, wsize)


def sadsob(sobl, sobr, ndisp, wsize=5):
    H, W = sobl.shape
    out = np.empty((H, W, ndisp), np.float32)
    _load().msn_sadsob(_c(sobl, np.float32), _c(sobr, np.float32),
                       H, W, ndisp, wsize, out)
    return out


def extract_aml(vol: np.ndarray, sigma: float) -> np.ndarray:
    v = _c(vol, np.float32)
    flat = v.reshape(-1, v.shape[-1])
    out = np.empty_like(flat)
    _load().msn_aml(flat, flat.shape[0], flat.shape[1], sigma, out)
    return out.reshape(v.shape)


def extract_pkrn(vol: np.ndarray, e: float) -> np.ndarray:
    v = _c(vol, np.float32)
    flat = v.reshape(-1, v.shape[-1])
    out = np.empty_like(flat)
    _load().msn_pkrn(flat, flat.shape[0], flat.shape[1], e, out)
    return out.reshape(v.shape)


def get_right_cost(cost_hwd: np.ndarray) -> np.ndarray:
    H, W, D = cost_hwd.shape
    out = np.empty((H, W, D), np.float32)
    _load().msn_get_right_cost(_c(cost_hwd, np.float32), H, W, D, out)
    return out


def get_left_cost(cost_hwd: np.ndarray) -> np.ndarray:
    H, W, D = cost_hwd.shape
    out = np.empty((H, W, D), np.float32)
    _load().msn_get_left_cost(_c(cost_hwd, np.float32), H, W, D, out)
    return out


def get_costs(iml, imr, maxdisp=192, censw=11, nccw=3, sadw=5, sobelw=5,
              board_h=10, board_w_left=10, board_w_right=0):
    """Native twin of oracle_np.get_costs (all volumes [H, W, D], trimmed)."""
    c_cen = census(iml, imr, maxdisp, censw)
    c_ncc = ncc_nister(iml, imr, maxdisp, nccw)
    c_sad = zsad(iml, imr, maxdisp, sadw)
    sl, sr = sobel(iml), sobel(imr)
    c_sob = sadsob(sl, sr, maxdisp, sobelw)
    h_end = -board_h if board_h > 0 else None
    w_end = -board_w_right if board_w_right > 0 else None
    trim = lambda a: np.ascontiguousarray(a[board_h:h_end, board_w_left:w_end, :])
    return trim(c_cen), trim(c_ncc), trim(c_sob), trim(c_sad)


def extract_features_left(census_c, ncc_c, sobel_c, sad_c,
                          cens_sigma=128.0, ncc_sigma=0.02,
                          sad_sigma=20000.0, sobel_sigma=20000.0):
    """Native twin of oracle_np.extract_features_left -> [8, D, H, W]."""
    h, w, ndisp = census_c.shape
    f = np.empty((8, h, w, ndisp), dtype=np.float32)
    f[0] = np.clip(census_c, 0.0, 120.0) / 120.0
    f[1] = (1.0 + np.clip(ncc_c, -1.0, 1.0)) / 2.0
    f[2] = np.clip(sobel_c, 0.0, 2 ** 13) / float(2 ** 13)
    f[3] = np.clip(sad_c, 0.0, 2 ** 13) / float(2 ** 13)
    f[4] = extract_aml(census_c, cens_sigma)
    f[5] = extract_aml(ncc_c, ncc_sigma)
    f[6] = extract_aml(sobel_c, sad_sigma)  # sad_sigma: reference parity
    f[7] = extract_aml(sad_c, sad_sigma)
    return np.ascontiguousarray(f.transpose(0, 3, 1, 2))
