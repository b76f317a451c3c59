"""Device-side MS-feature pipeline.

The reference computes matching-space features on CPU worker processes and
ships ~100 MB volumes to the device per sample (reference:
src/dataloader/cbmv_generator.py:549-723). Here the hosts ship *uint8 image
pairs* (~0.4 MB) and the whole feature stage — anti-aliased downsample, four
matchers, AML confidences, normalization, channel assembly — runs jitted on
the TPU.

Numerics mirror the reference exactly:
  * normalizations (cbmv_generator.py:283-287):
      census: clip(0, 120)/120, ncc: (1+clip(-1,1))/2,
      sobel & zsad: clip(0, 2^13)/2^13
  * AML sigmas: census 128.0, ncc 0.02, sad 2e4; the sobel channel uses
    sad_sigma (the reference's sobel_sigma argument is dead,
    cbmv_generator.py:224-225,298)
  * margins trimmed from each cost volume before assembly
    (cbmv_generator.py:73-79)
  * the 1/2-resolution anti-aliased downsample replicates
    skimage.transform.rescale(scale=0.5, anti_aliasing=True, mode='constant'):
    gaussian blur sigma=0.5 (5-tap, zero-padded) on img/255, bilinear
    resample at source coords 2*o+0.5 (= 2x2 average), *255, truncate to uint8
    (cbmv_generator.py:465-482).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MatchingConfig
from . import matchers as M


def _gaussian_kernel1d(sigma: float = 0.5, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage gaussian weights: phi(x) normalized over integer taps."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return (phi / phi.sum()).astype(np.float64)


@jax.jit
def downsample_half(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W] -> uint8 [H//2 (rounded), W//2] anti-aliased half-scale.

    Matches the reference's skimage path (down_sampling_input,
    cbmv_generator.py:465-482). Output size = round(dim * 0.5) (numpy
    banker's rounding, matching skimage).
    """
    H, W = img.shape
    oh = int(np.round(H * 0.5)) if H % 2 else H // 2
    ow = int(np.round(W * 0.5)) if W % 2 else W // 2
    x = img.astype(jnp.float32) / 255.0
    kern = _gaussian_kernel1d()
    r = (len(kern) - 1) // 2
    # separable gaussian as shift-multiply-adds (pure VPU, exact fp32;
    # a conv would run through the MXU at bf16 precision on TPU and
    # perturb the uint8 rounding), zero ('constant') padding
    def gauss_axis(a, axis):
        ap = jnp.pad(a, [(r, r) if i == axis else (0, 0) for i in range(2)])
        n = a.shape[axis]
        acc = None
        for i, kv in enumerate(kern):
            sl = jax.lax.slice_in_dim(ap, i, i + n, axis=axis)
            acc = sl * np.float32(kv) if acc is None else acc + sl * np.float32(kv)
        return acc
    x = gauss_axis(gauss_axis(x, 0), 1)
    # bilinear at source coords 2*o + 0.5 == 2x2 average. Implemented via a
    # crop/zero-pad + reshape instead of stride-2 slices: lane-strided
    # gathers cost ~1.5 ms on v5e for this shape vs ~0 for the reshape form
    # (scripts/perf_downsample.py). Zero padding for odd dims matches
    # skimage's warp(mode='constant', cval=0) out-of-range handling.
    ph, pw = max(0, 2 * oh - H), max(0, 2 * ow - W)
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)))
    x = x[:2 * oh, :2 * ow].reshape(oh, 2, ow, 2)
    x = (x[:, 0, :, 0] + x[:, 0, :, 1] + x[:, 1, :, 0] + x[:, 1, :, 1]) * 0.25
    return (x * 255.0).astype(jnp.uint8)


def downsample_half_np(img: np.ndarray) -> np.ndarray:
    """Host (NumPy/SciPy) twin of :func:`downsample_half` in float64."""
    import scipy.ndimage as ndi
    H, W = img.shape
    oh = int(np.round(H * 0.5))
    ow = int(np.round(W * 0.5))
    x = img.astype(np.float64) / 255.0
    x = ndi.gaussian_filter(x, 0.5, mode="constant")
    # zero-pad odd dims to 2*oh/2*ow like the device twin (skimage's
    # cval=0 out-of-range handling); without this, dims ≡ 3 (mod 4) —
    # e.g. KITTI's H=375 — produce mismatched strided slices and crash
    ph, pw = max(0, 2 * oh - H), max(0, 2 * ow - W)
    if ph or pw:
        x = np.pad(x, ((0, ph), (0, pw)))
    x = (x[0:2 * oh:2, 0:2 * ow:2] + x[0:2 * oh:2, 1:2 * ow:2]
         + x[1:2 * oh:2, 0:2 * ow:2] + x[1:2 * oh:2, 1:2 * ow:2]) * 0.25
    return (x * 255.0).astype(np.uint8)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def compute_costs(iml: jnp.ndarray, imr: jnp.ndarray, maxdisp: int,
                  censw: int = 11, nccw: int = 3, sadw: int = 5, sobelw: int = 5,
                  board_h: int = 10, board_w_left: int = 10, board_w_right: int = 0):
    """All four matching costs, unified [H', W', D] layout, margins trimmed.

    Mirrors get_costs (cbmv_generator.py:27-79). Returns
    (census, ncc, sobel_sad, zsad).
    """
    c_cen = M.census(iml, imr, maxdisp, censw)
    c_ncc = M.ncc_nister(iml, imr, maxdisp, nccw)
    c_sad = M.zsad(iml, imr, maxdisp, sadw)
    sl = M.sobel(iml)
    sr = M.sobel(imr)
    c_sob = M.sadsob(sl, sr, maxdisp, sobelw)
    H, W = iml.shape
    h_end = H - board_h if board_h > 0 else H
    w_end = W - board_w_right if board_w_right > 0 else W

    def trim(c):
        return c[board_h:h_end, board_w_left:w_end, :]

    return trim(c_cen), trim(c_ncc), trim(c_sob), trim(c_sad)


def _normalize_stack(c_cen, c_ncc, c_sob, c_sad, cfg: MatchingConfig,
                     out_dtype=jnp.float32):
    """8 channels in [H, W, D, C] order (channels innermost, TPU-friendly).

    ``out_dtype=bfloat16`` halves the cost of materializing the stacked
    volume — the channel-minor interleave of eight D-minor cost volumes is
    a lane-crossing write (~5 ms in f32 at bench shapes, the single biggest
    feature-stage cost, scripts/perf_feat_layout.py) — and loses nothing on
    the TPU inference path, which casts the volume to bfloat16 anyway."""
    ch = [
        jnp.clip(c_cen, 0.0, 120.0) / 120.0,
        (1.0 + jnp.clip(c_ncc, -1.0, 1.0)) / 2.0,
        jnp.clip(c_sob, 0.0, 2.0 ** 13) / 2.0 ** 13,
        jnp.clip(c_sad, 0.0, 2.0 ** 13) / 2.0 ** 13,
        M.extract_aml(c_cen, cfg.cens_sigma),
        M.extract_aml(c_ncc, cfg.ncc_sigma),
        M.extract_aml(c_sob, cfg.sad_sigma),  # sad_sigma on purpose (parity)
        M.extract_aml(c_sad, cfg.sad_sigma),
    ]
    return jnp.stack([c.astype(out_dtype) for c in ch], axis=-1)


@functools.partial(jax.jit, static_argnums=(4, 5))
def assemble_features_left(c_cen, c_ncc, c_sob, c_sad, cfg: MatchingConfig,
                           out_dtype=jnp.float32):
    """8-channel MS feature volume, native layout [D, H, W, C].

    Semantics of extract_features_left (cbmv_generator.py:258-308); the
    reference's [C, D, H, W] is a transpose away (see to_ncdhw).
    """
    f = _normalize_stack(c_cen, c_ncc, c_sob, c_sad, cfg, out_dtype)
    return jnp.transpose(f, (2, 0, 1, 3))                   # [D, H, W, 8]


@functools.partial(jax.jit, static_argnums=(4, 5))
def assemble_features_lr(c_cen, c_ncc, c_sob, c_sad, cfg: MatchingConfig,
                         out_dtype=jnp.float32):
    """16-channel variant (left + right view), layout [D, H, W, 16].

    Right-view costs are re-indexed from the left volumes via
    R[i,j,d] = L[i,j+d,d] (extract_features_lr, cbmv_generator.py:84-254).
    """
    fl = _normalize_stack(c_cen, c_ncc, c_sob, c_sad, cfg, out_dtype)
    fr = _normalize_stack(M.get_right_cost(c_cen), M.get_right_cost(c_ncc),
                          M.get_right_cost(c_sob), M.get_right_cost(c_sad),
                          cfg, out_dtype)
    f = jnp.concatenate([fl, fr], axis=-1)                  # [H, W, D, 16]
    return jnp.transpose(f, (2, 0, 1, 3))


def to_ncdhw(f_dhwc: jnp.ndarray) -> jnp.ndarray:
    """[.., D, H, W, C] -> [.., C, D, H, W] (reference layout)."""
    return jnp.moveaxis(f_dhwc, -1, -4)


def from_ncdhw(f_cdhw: jnp.ndarray) -> jnp.ndarray:
    """[.., C, D, H, W] -> [.., D, H, W, C] (native layout)."""
    return jnp.moveaxis(f_cdhw, -4, -1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def raw_features(iml: jnp.ndarray, imr: jnp.ndarray, maxdisp: int,
                 board_h: int, board_w_left: int, board_w_right: int = 0,
                 out_dtype=jnp.float32) -> jnp.ndarray:
    """2-channel raw-intensity concat volume [D, H', W', 2], margins trimmed.

    The no-matching ablation baseline (MatchingConfig.features_mode="raw"):
    channel 0 = L(x)/255 broadcast over d, channel 1 = R(x-d)/255 (zero
    where x-d < 0) — GCNet's concat cost volume with the unary feature net
    replaced by the pixel itself. Exists to demonstrate the paper's central
    claim mechanically: matching-space inputs generalize across texture /
    photometric domains where intensity inputs do not (reference
    README.md:92-101).
    """
    H, W = iml.shape
    # both channels normalize in float32 and cast once at the end, so L and
    # R see identical rounding when out_dtype is bf16 (advisor r4)
    L = (iml.astype(jnp.float32) / np.float32(255.0)).astype(out_dtype)
    R = imr.astype(jnp.float32) / np.float32(255.0)
    # slice-form shifts (cheap static pads, like the matchers)
    Rs = jnp.stack([jnp.pad(R[:, :W - d], ((0, 0), (d, 0))).astype(out_dtype)
                    for d in range(maxdisp)], axis=0)       # [D, H, W]
    f = jnp.stack([jnp.broadcast_to(L, Rs.shape), Rs], axis=-1)
    h_end = H - board_h if board_h > 0 else H
    w_end = W - board_w_right if board_w_right > 0 else W
    return f[:, board_h:h_end, board_w_left:w_end, :]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def ms_features(iml: jnp.ndarray, imr: jnp.ndarray, maxdisp: int,
                cfg: MatchingConfig, board_h: int, board_w_left: int,
                board_w_right: int = 0, left_only: bool = True,
                out_dtype=jnp.float32) -> jnp.ndarray:
    """Full device feature stage for a (possibly already downsampled) pair.

    uint8 [H, W] x2 -> features [D, H', W', C] with margins trimmed.
    ``maxdisp`` and the margins must already be at the working resolution
    (callers divide by ds_scale, cf. cbmv_generator.py:667-675).
    ``cfg.features_mode="raw"`` dispatches to the raw-intensity ablation
    volume instead of the matching-space stack.
    """
    if cfg.features_mode == "raw":
        return raw_features(iml, imr, maxdisp, board_h, board_w_left,
                            board_w_right, out_dtype)
    costs = compute_costs(iml, imr, maxdisp, cfg.censw, cfg.nccw, cfg.sadw,
                          cfg.sobelw, board_h, board_w_left, board_w_right)
    if left_only:
        return assemble_features_left(*costs, cfg, out_dtype)
    return assemble_features_lr(*costs, cfg, out_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def ms_features_train(iml: jnp.ndarray, imr: jnp.ndarray, maxdisp: int,
                      cfg: MatchingConfig, board_h: int, board_w_left: int,
                      board_w_right: int = 0, left_only: bool = True,
                      out_dtype=jnp.float32) -> jnp.ndarray:
    """Train-sample feature stage: downsample by ds_scale, then features.

    Mirrors generate_crop_train_cbmv's device-relevant tail
    (cbmv_generator.py:663-685): inputs are the *cropped* full-res pair
    including margins; maxdisp/margins are divided by ds_scale here.
    """
    s = cfg.ds_scale
    if s == 2:
        iml = downsample_half(iml)
        imr = downsample_half(imr)
    elif s != 1:
        raise NotImplementedError(f"ds_scale={s}")
    return ms_features(iml, imr, maxdisp // s, cfg, board_h // s,
                       board_w_left // s, board_w_right // s, left_only,
                       out_dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def ms_features_test(iml: jnp.ndarray, imr: jnp.ndarray, maxdisp: int,
                     cfg: MatchingConfig, left_only: bool = True,
                     out_dtype=jnp.float32) -> jnp.ndarray:
    """Test-time feature stage (generate_test_cbmv, cbmv_generator.py:727-861).

    Inputs are the full-res pair already padded to a multiple of encoder_ds
    (top + right, host side). Here: downsample by ds_scale, pad a 10-px
    border on all sides to keep sentinel values off the image
    (cbmv_generator.py:818-823), compute features with board 10/10/10, which
    trims the border back off. Output [D/s, H/s, W/s, C].
    """
    s = cfg.ds_scale
    if s == 2:
        iml = downsample_half(iml)
        imr = downsample_half(imr)
    elif s != 1:
        raise NotImplementedError(f"ds_scale={s}")
    b = 10
    iml = jnp.pad(iml, ((b, b), (b, b)))
    imr = jnp.pad(imr, ((b, b), (b, b)))
    return ms_features(iml, imr, maxdisp // s, cfg, b, b, b, left_only,
                       out_dtype)
