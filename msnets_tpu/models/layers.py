"""3-D CNN building blocks with PyTorch-parity shape semantics.

Native layout is channels-last [N, D, H, W, C] (TPU/XLA friendly); the
reference's [N, C, D, H, W] is an adapter away (ops.features.to_ncdhw).

Parity notes (reference: src/models/gcnet_3dcnn.py, psmnet_3dcnn.py):
  * Conv3d(k=3, padding=1, stride=s): explicit (1,1) padding per spatial dim.
  * ConvTranspose3d(k=3, stride=2, padding=1, output_padding=1) doubles every
    spatial dim. Implemented as an input-dilated convolution with asymmetric
    padding (lo = k-1-p = 1, hi = k-1-p+output_padding = 2); the kernel is
    stored pre-flipped relative to PyTorch (the checkpoint converter flips).
  * BatchNorm3d: eps 1e-5, momentum 0.1 (flax momentum 0.9), affine, running
    stats; batch statistics reduce over N,D,H,W. Under a sharded mesh the
    reductions become XLA collectives automatically (GSPMD).
  * He-normal init: std = sqrt(2 / (k^3 * out_ch)) for both conv and deconv
    (reference src/models/net_init.py:26-54).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..parallel import mesh as pmesh


def _conv(lhs, rhs, *args, **kwargs):
    """lax.conv_general_dilated with the RHS kernel pinned replicated on the
    active mesh (pmesh.replicate): the GSPMD partitioner miscompiles convs
    whose kernel is a computed value (eval BN folds, packed/expanded kernel
    rearrangements) when the volume is sharded on two conv dims at once —
    wrong values everywhere, not an fp-noise effect. No-op single-device."""
    return jax.lax.conv_general_dilated(lhs, pmesh.replicate(rhs),
                                        *args, **kwargs)


def _disp_sharded() -> bool:
    """True when the active mesh partitions the disparity axis."""
    mesh = pmesh.current_mesh() if hasattr(pmesh, "current_mesh") else None
    if mesh is None:
        return False
    return dict(zip(mesh.axis_names,
                    mesh.devices.shape)).get("disp", 1) > 1


def conv2d_planes_nd(x5: jnp.ndarray, k2: jnp.ndarray,
                     strides_hw=(1, 1), pad2=((0, 0), (0, 0)),
                     pet=None) -> jnp.ndarray:
    """2-D conv per depth plane of [N, D, H, W, C] as a kd=1 NDHWC conv.

    ONLY for disp-sharded meshes: the usual free reshape to (N*D, H, W, C)
    folds the SHARDED depth dim into batch, which GSPMD cannot keep
    partitioned — it all-gathers the volume (9.5 GB/step of the disp axis's
    raw traffic at the reference recipe; SCALING.md). The kd=1 form keeps D
    a partitioned spatial dim. Do NOT use it single-device: a first landing
    that restructured the single-device path too cost ~10% eval throughput
    (the per-tap reshapes perturb XLA fusion; SCALING.md "deferred" note) —
    hence the whole-loop gating at every call site, with the original 4-D
    accumulation kept verbatim when no disp mesh is active.
    """
    k3 = k2[None]                            # [1, kh, kw, cin, cout]
    dn = jax.lax.conv_dimension_numbers(x5.shape, k3.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return _conv(x5, k3, (1,) + tuple(strides_hw), [(0, 0)] + list(pad2),
                 dimension_numbers=dn, preferred_element_type=pet)


def he_normal_msnets(kernel_spatial: int = 3):
    """N(0, sqrt(2/n)) with n = k^3 * out_channels (net_init.py:30-34).

    Works for kernels laid out [..., in_ch, out_ch] (out channels last).
    """
    def init(key, shape, dtype=jnp.float32):
        k3 = int(np.prod(shape[:-2]))
        n = k3 * shape[-1]
        std = np.sqrt(2.0 / n)
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)
    return init


_S2_HW_S2D_MIN_VOXELS = 1_000_000


def _quant_act(x, scale=None):
    """Symmetric int8 quantization of an activation tensor.

    Returns (int8 tensor, f32 scale broadcastable against x). v5e's MXU
    runs s8 x s8 -> s32 at 2x the bf16 rate (measured 2.6x on the stem
    conv shapes, scripts/perf_int8_conv.py).

    ``scale=None`` (dynamic): PER-SAMPLE scale from a max-abs pass, reducing
    over every axis EXCEPT the leading batch axis, so eval outputs for one
    image never depend on another image in the same batch. The extra pass
    costs a full HBM read of the volume per quantized conv — enough to make
    int8 lose to bf16 at bench shapes (PERF.md).

    ``scale`` given (static): a fixed per-layer scalar recorded by a
    calibration forward (ConvBN3D quant_mode="calib"); the round/clip/cast
    is then a pure elementwise op XLA fuses into the producer — no max
    pass. Out-of-calibration-range values saturate at +-127 (standard
    absmax post-training quantization). Either way all depth taps share
    one scale, so cross-tap int32 partial sums accumulate exactly."""
    xf = x.astype(jnp.float32)
    if scale is None:
        axes = tuple(range(1, xf.ndim))
        scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=axes, keepdims=True),
                            1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _quant_kernels(ks):
    """Quantize per-tap conv kernels jointly, per OUTPUT channel.

    One shared per-cout scale across all taps lets the taps' int32 partial
    sums accumulate exactly before a single dequantization. Per-channel
    scales absorb the folded BN gamma, so quantization error stays relative
    per channel. Returns ([int8 kernels], scale[cout] f32)."""
    kf = [k.astype(jnp.float32) for k in ks]
    amax = None
    for k in kf:
        m = jnp.max(jnp.abs(k), axis=tuple(range(k.ndim - 1)))
        amax = m if amax is None else jnp.maximum(amax, m)
    sk = jnp.maximum(amax, 1e-12) / 127.0
    kq = [jnp.clip(jnp.round(k / sk), -127, 127).astype(jnp.int8) for k in kf]
    return kq, sk


def conv3d_ndhwc(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                 pad: int, dtype, decompose: bool = True,
                 quantized: bool = False, act_scale=None,
                 force_s2d: bool = False) -> jnp.ndarray:
    """3-D convolution, NDHWC x DHWIO.

    ``decompose=True`` (default) lowers *stride-1* convs to kd batched 2-D
    convolutions over (N*D, H, W) summed along the kernel's depth taps —
    measured ~1.5-2.4x faster than XLA's native conv3d lowering on TPU v5e
    (scripts/perf_conv3d.py, perf_block1.py). Stride-2 convs on LARGE
    volumes use the H,W space-to-depth + D-parity lowering (1.56x faster
    than native at block1's [96,128,256] shape, scripts/perf_conv3d_s2_hw.py);
    small volumes and other strides stay on the native lowering (the s2d
    transpose overhead loses below ~1M voxels, and a fully strided per-kz
    decomposition measured ~3.5x slower). Bit-identical math up to fp32
    partial-sum reassociation.
    """
    kd, kh, kw, cin, cout = kernel.shape
    if (stride == 2 and decompose and (kd, kh, kw) == (3, 3, 3) and pad == 1
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[3] % 2 == 0
            and (force_s2d or x.shape[1] * x.shape[2] * x.shape[3]
                 >= _S2_HW_S2D_MIN_VOXELS)):
        # force_s2d: train-mode callers take the s2d form below the eval
        # voxel gate too — the stride-1 2-D convs' VJPs are stride-1 convs,
        # beating XLA's dense lhs_dilation backward for the native strided
        # form (full step 159.2 -> 155.8 ms, scripts/perf_train_s2d_gate.py)
        return conv3d_s2_hw_s2d(x, kernel, dtype, quantized=quantized,
                                act_scale=act_scale)
    if stride != 1:
        decompose = False
    if not decompose:
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NDHWC", "DHWIO", "NDHWC"))
        return _conv(
            x.astype(dtype), kernel.astype(dtype), (stride,) * 3,
            [(pad, pad)] * 3, dimension_numbers=dn)
    N, D, H, W, _ = x.shape
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    d_out = (D + 2 * pad - kd) // stride + 1
    h_out = (H + 2 * pad - kh) // stride + 1
    w_out = (W + 2 * pad - kw) // stride + 1
    if _disp_sharded():
        out = None
        for dz in range(kd):
            sl = jax.lax.slice_in_dim(xp, dz, dz + stride * (d_out - 1) + 1,
                                      stride=stride, axis=1)
            y = conv2d_planes_nd(sl, kernel[dz], (stride, stride),
                                 [(pad, pad)] * 2)
            out = y if out is None else out + y
        return out
    out = None
    for dz in range(kd):
        sl = jax.lax.slice_in_dim(xp, dz, dz + stride * (d_out - 1) + 1,
                                  stride=stride, axis=1)
        s2 = sl.reshape(N * d_out, H, W, cin)
        dn = jax.lax.conv_dimension_numbers(s2.shape, kernel.shape[1:],
                                            ("NHWC", "HWIO", "NHWC"))
        # same-dtype in/out: a float32 preferred_element_type on bf16
        # operands breaks the conv transpose (autodiff) rule with a dtype
        # mismatch; the MXU accumulates in f32 internally regardless
        y = _conv(
            s2, kernel[dz], (stride, stride), [(pad, pad)] * 2,
            dimension_numbers=dn)
        out = y if out is None else out + y
    return out.reshape(N, d_out, h_out, w_out, cout)


def _hw_block_kernel(kernel: jnp.ndarray, kz: int, dtype) -> jnp.ndarray:
    """K[kz] (3,3,cin,cout) -> H,W space-to-depth block kernel
    (2,2,4*cin,cout): kp[b, o] = K[2b + o - 1] per axis (front-pad 3 -> 4,
    split into (block, offset)); input channel order must be (oh, ow, c)."""
    k = kernel[kz]
    cin, cout = k.shape[2], k.shape[3]
    kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))      # [4,4,cin,cout]
    kp = kp.reshape(2, 2, 2, 2, cin, cout)                 # [bh,oh,bw,ow,..]
    k2 = jnp.transpose(kp, (0, 2, 1, 3, 4, 5)).reshape(2, 2, 4 * cin, cout)
    return k2.astype(dtype)


def conv3d_s2_hw_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     dtype, packed_input: bool = False,
                     quantized: bool = False, act_scale=None) -> jnp.ndarray:
    """k=3, stride-2, pad-1 conv3d via H,W space-to-depth + D-parity split.

    XLA's native stride-2 conv3d is the encoder's worst MXU shape (~6-7
    TFLOP/s on v5e: tiny contraction, strided reads). Folding each 2x2 H,W
    block into channels gives stride-1 2-D convs with a 4*cin contraction
    ((4/3)^2 = 1.78x padded FLOPs — cheaper than the 2.37x of a full 3-axis
    space-to-depth, which measured SLOWER than native, see
    scripts/perf_conv3d_s2d.py); the three depth taps reduce over the even/
    odd D planes:  out[m] = K[1]*xe[m] + K[2]*xo[m] + K[0]*xo[m-1].
    Measured 1.56x faster than native at block1's [96,128,256] shape
    (3.97 vs 6.18 ms, scripts/perf_conv3d_s2_hw.py); loses below ~1M voxels
    where the s2d transpose overhead dominates.
    """
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3)
    if packed_input:
        # input already in hw_pack layout [N, D, H/2, W/2, 4*cin]
        N, D, H2, W2, c4 = x.shape
        assert c4 == 4 * cin and D % 2 == 0
        D2 = D // 2
        xs = x
    else:
        N, D, H, W, _ = x.shape
        assert D % 2 == 0 and H % 2 == 0 and W % 2 == 0
        D2, H2, W2 = D // 2, H // 2, W // 2
        xs = x.reshape(N, D, H2, 2, W2, 2, cin)
        xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5, 6)).reshape(N, D, H2, W2,
                                                              4 * cin)
    k2s = [_hw_block_kernel(kernel, kz, jnp.float32 if quantized else dtype)
           for kz in (1, 2, 0)]
    if quantized:
        xs, sx = _quant_act(xs, act_scale)
        k2s, sk = _quant_kernels(k2s)
    else:
        xs = xs.astype(dtype)
    xe = xs[:, 0::2]                                   # planes 2m
    xo = xs[:, 1::2]                                   # planes 2m+1
    xo_m1 = jnp.pad(xo, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :D2]

    def c2d(v, k2):
        if _disp_sharded():
            return conv2d_planes_nd(v, k2, (1, 1), [(1, 0), (1, 0)],
                                    pet=jnp.int32 if quantized else None)
        s2 = v.reshape(N * D2, H2, W2, 4 * cin)
        dn = jax.lax.conv_dimension_numbers(s2.shape, k2.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = _conv(
            s2, k2, (1, 1), [(1, 0), (1, 0)], dimension_numbers=dn,
            preferred_element_type=jnp.int32 if quantized else None)
        return y.reshape(N, D2, H2, W2, cout)

    out = c2d(xe, k2s[0]) + c2d(xo, k2s[1]) + c2d(xo_m1, k2s[2])
    if quantized:
        out = (out.astype(jnp.float32) * (sx * sk)).astype(dtype)
    return out


def hw_pack(x: jnp.ndarray) -> jnp.ndarray:
    """[N, D, H, W, C] -> H,W space-to-depth packed [N, D, H/2, W/2, 4C].

    Channel order (oh, ow, c) — block (bh, bw) channel (oh*2+ow)*C + c holds
    full-res voxel (2bh+oh, 2bw+ow, c). Matches `_hw_block_kernel`'s input
    convention, so `conv3d_s2_hw_s2d` can consume pre-packed input."""
    N, D, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0
    xs = x.reshape(N, D, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(xs, (0, 1, 2, 4, 3, 5, 6)).reshape(
        N, D, H // 2, W // 2, 4 * C)


def hw_unpack(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `hw_pack`: [N, D, Hb, Wb, 4C] -> [N, D, 2Hb, 2Wb, C]."""
    N, D, Hb, Wb, C4 = x.shape
    C = C4 // 4
    xs = x.reshape(N, D, Hb, Wb, 2, 2, C)
    return jnp.transpose(xs, (0, 1, 2, 4, 3, 5, 6)).reshape(
        N, D, 2 * Hb, 2 * Wb, C)


def _s1_packed_kernel(k2d: jnp.ndarray, dtype) -> jnp.ndarray:
    """K[3,3,cin,cout] -> packed block kernel [2,2,4cin,4cout] for the
    stride-1 conv in H,W space-to-depth layout.

    Output block phase p at full-res row 2j+p (std alignment) or 2j-1+p
    (shifted) reads input block offset b, phase q at tap dy = 2b + q - p
    (zero outside 0..2). 6 of 8 (b,q,p) slots are live per axis -> (4/3)^2 =
    1.78x padded FLOPs, but the GEMM N dim becomes 4*cout (full 128-lane MXU
    utilization for cout=32, vs 25% unpacked). Channel order (ph, pw, c) on
    both sides."""
    cin, cout = k2d.shape[2], k2d.shape[3]
    kp = np.zeros((2, 2, 2, 2, 2, 2), np.float32)  # [bh,bw,qh,qw,ph,pw]
    sel = np.zeros((2, 2, 2, 2, 2, 2, 2), np.int64)  # + (dy,dx)
    for bh in range(2):
        for qh in range(2):
            for ph in range(2):
                dy = 2 * bh + qh - ph
                if not 0 <= dy <= 2:
                    continue
                for bw in range(2):
                    for qw in range(2):
                        for pw in range(2):
                            dx = 2 * bw + qw - pw
                            if not 0 <= dx <= 2:
                                continue
                            kp[bh, bw, qh, qw, ph, pw] = 1.0
                            sel[bh, bw, qh, qw, ph, pw] = (dy, dx)
    # gather k2d[dy, dx] per live slot; dead slots masked to zero
    out = (k2d[sel[..., 0], sel[..., 1]]
           * jnp.asarray(kp)[..., None, None])    # [2,2,2,2,2,2,cin,cout]
    # in channels (qh, qw, cin) -> axes (2,3,6); out (ph, pw, cout) -> (4,5,7)
    out = jnp.transpose(out, (0, 1, 2, 3, 6, 4, 5, 7))
    return out.reshape(2, 2, 4 * cin, 4 * cout).astype(dtype)


def conv3d_s1_hw_packed(xp: jnp.ndarray, kernel: jnp.ndarray, dtype,
                        to_shifted: bool, quantized: bool = False,
                        act_scale=None) -> jnp.ndarray:
    """k=3, stride-1, pad-1 conv3d computed entirely in H,W space-to-depth
    packed layout (see `hw_pack`).

    Two block alignments alternate through a chain of convs:
      std:     block j holds full-res rows (2j, 2j+1)       [Hb = H/2]
      shifted: block j holds full-res rows (2j-1, 2j)       [Hb = H/2 + 1]
    std->shifted uses block-window 2 with pad (1,1); shifted->std pad (0,0)
    (the shifted tensor carries the +-1 halo). Shifted halo entries (full-res
    rows -1 and H, cols -1 and W) must be ZERO on input — callers zero them
    after any bias add (`zero_shift_halo`). The depth axis stays full-res
    (3 taps summed, as in `conv3d_ndhwc`'s decomposition)."""
    N, D, Hb, Wb, c4 = xp.shape
    cin = c4 // 4
    cout = kernel.shape[-1]
    pad2 = [(1, 1), (1, 1)] if to_shifted else [(0, 0), (0, 0)]
    k2s = [_s1_packed_kernel(kernel[dz],
                             jnp.float32 if quantized else dtype)
           for dz in range(3)]
    if quantized:
        xp, sx = _quant_act(xp, act_scale)
        k2s, sk = _quant_kernels(k2s)
    else:
        xp = xp.astype(dtype)
    xpd = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    if _disp_sharded():
        out = None
        for dz in range(3):
            y = conv2d_planes_nd(xpd[:, dz:dz + D], k2s[dz], (1, 1), pad2,
                                 pet=jnp.int32 if quantized else None)
            out = y if out is None else out + y
    else:
        out = None
        for dz in range(3):
            sl = xpd[:, dz:dz + D].reshape(N * D, Hb, Wb, c4)
            dn = jax.lax.conv_dimension_numbers(sl.shape, k2s[dz].shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = _conv(
                sl, k2s[dz], (1, 1), pad2, dimension_numbers=dn,
                preferred_element_type=jnp.int32 if quantized else None)
            out = y if out is None else out + y
        Ho = Hb + 1 if to_shifted else Hb - 1
        Wo = Wb + 1 if to_shifted else Wb - 1
        out = out.reshape(N, D, Ho, Wo, 4 * cout)
    if quantized:
        out = (out.astype(jnp.float32) * (sx * sk)).astype(dtype)
    return out


def _s1_w_packed_kernel(k2d: jnp.ndarray, dtype) -> jnp.ndarray:
    """K[3,3,cin,cout] -> [3(kh), 2(bw), 2cin, 2cout] for the stride-1 conv
    in W-only space-to-depth layout (same tap algebra as `_s1_packed_kernel`
    on the W axis only: dx = 2b + q - p, zero outside 0..2)."""
    cin, cout = k2d.shape[2], k2d.shape[3]
    mask = np.zeros((2, 2, 2), np.float32)       # [bw, qw, pw]
    sel = np.zeros((2, 2, 2), np.int64)
    for b in range(2):
        for q in range(2):
            for p in range(2):
                dx = 2 * b + q - p
                if 0 <= dx <= 2:
                    mask[b, q, p] = 1.0
                    sel[b, q, p] = dx
    out = k2d[:, sel] * jnp.asarray(mask)[None, ..., None, None]
    # [kh, bw, qw, pw, cin, cout] -> in (qw, cin), out (pw, cout)
    out = jnp.transpose(out, (0, 1, 2, 4, 3, 5))
    return out.reshape(3, 2, 2 * cin, 2 * cout).astype(dtype)


def conv3d_s1_w_packed(xw: jnp.ndarray, kernel: jnp.ndarray, dtype,
                       to_shifted: bool, quantized: bool = False,
                       act_scale=None) -> jnp.ndarray:
    """k=3, stride-1, pad-1 conv3d in W-only space-to-depth layout
    [N, D, H, Wb, 2C] (channel order (qw, c)).

    The W-fold is a FREE reshape of a full-layout tensor (W-major pairs are
    channel-contiguous), so unlike the 2x2 H,W packing there is no entry
    transpose at all; the packed GEMM doubles the MXU N-dim (cout 64 -> 128
    for the encoder block convs) at 4/3 padded FLOPs. Alignments alternate
    std<->shifted exactly as in `conv3d_s1_hw_packed` (W axis only); the
    shifted tensor has Wb+1 blocks with an out-of-image halo that callers
    zero (`zero_w_halo`). H keeps ordinary pad-1 taps."""
    N, D, Hh, Wb, c2 = xw.shape
    cin = c2 // 2
    padw = (1, 1) if to_shifted else (0, 0)
    k2s = [_s1_w_packed_kernel(kernel[dz],
                               jnp.float32 if quantized else dtype)
           for dz in range(3)]
    if quantized:
        xw, sx = _quant_act(xw, act_scale)
        k2s, sk = _quant_kernels(k2s)
    else:
        xw = xw.astype(dtype)
    xpd = jnp.pad(xw, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    if _disp_sharded():
        out = None
        for dz in range(3):
            y = conv2d_planes_nd(xpd[:, dz:dz + D], k2s[dz], (1, 1),
                                 [(1, 1), padw],
                                 pet=jnp.int32 if quantized else None)
            out = y if out is None else out + y
    else:
        out = None
        for dz in range(3):
            sl = xpd[:, dz:dz + D].reshape(N * D, Hh, Wb, c2)
            dn = jax.lax.conv_dimension_numbers(sl.shape, k2s[dz].shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = _conv(
                sl, k2s[dz], (1, 1), [(1, 1), padw], dimension_numbers=dn,
                preferred_element_type=jnp.int32 if quantized else None)
            out = y if out is None else out + y
        Wo = Wb + 1 if to_shifted else Wb - 1
        out = out.reshape(N, D, Hh, Wo, 2 * kernel.shape[-1])
    if quantized:
        out = (out.astype(jnp.float32) * (sx * sk)).astype(dtype)
    return out


def w_fold(x: jnp.ndarray) -> jnp.ndarray:
    """[N, D, H, W, C] -> [N, D, H, W/2, 2C]: pure reshape (free)."""
    N, D, H, W, C = x.shape
    return x.reshape(N, D, H, W // 2, 2 * C)


def w_unfold(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `w_fold` (free)."""
    N, D, H, Wb, C2 = x.shape
    return x.reshape(N, D, H, 2 * Wb, C2 // 2)


def zero_w_halo(y: jnp.ndarray) -> jnp.ndarray:
    """Zero the out-of-image halo of a W-shifted packed tensor (full-res
    cols -1 / W at block 0 phase 0 / block Wb-1 phase 1).

    Expressed as a fused iota-mask select, NOT ``.at[].set(0)``: the scatter
    form lowers to chains of full-buffer dynamic-update-slice ops in both
    the forward and the VJP (~400 MB each at the reference train recipe —
    the dominant standalone glue in the train step's optimized HLO,
    scripts/perf_train_fat.py), while the select fuses into the adjacent
    elementwise stages for free."""
    C = y.shape[-1] // 2
    Wb, C2 = y.shape[3], y.shape[-1]
    w = jax.lax.broadcasted_iota(jnp.int32, (Wb, C2), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (Wb, C2), 1)
    halo = ((w == 0) & (c < C)) | ((w == Wb - 1) & (c >= C))
    return jnp.where(halo, jnp.zeros((), y.dtype), y)


def conv3d_s1_full_to_packed(x: jnp.ndarray, kernel: jnp.ndarray, dtype,
                             to_shifted: bool, quantized: bool = False,
                             act_scale=None) -> jnp.ndarray:
    """k=3, stride-1, pad-1 conv3d reading FULL-res input and writing packed
    H,W space-to-depth output — the entry point into the packed world.

    An explicit `hw_pack` transpose of the 8-channel input volume costs
    4.9 ms on v5e (minor-dim 8 -> 94% tile-padding waste); instead the four
    output phases p of each 2x2 block are computed by ONE stride-2 conv with
    a 4x4 expanded kernel K4[p + dy, p + dx] = K[dy, dx] (window rows
    2bh-1..2bh+2 for std alignment, 2bh-2..2bh+1 shifted), writing channels
    (ph, pw, c). 2.31 ms at bench shapes vs 4.85 + 3.16 for pack + packed
    conv (scripts/perf_pack_lowerings.py). Shifted output carries the usual
    out-of-image halo — callers zero it (`zero_shift_halo`)."""
    N, D, H, W, cin = x.shape
    cout = kernel.shape[-1]
    S = np.zeros((4, 4, 3, 3, 4), np.float32)   # [t_h, t_w, dy, dx, p]
    for ph in range(2):
        for pw in range(2):
            p = ph * 2 + pw
            for dy in range(3):
                for dx in range(3):
                    S[ph + dy, pw + dx, dy, dx, p] = 1.0
    Sj = jnp.asarray(S)
    pad2 = [(2, 2), (2, 2)] if to_shifted else [(1, 2), (1, 2)]
    k4s = [jnp.einsum("twyxp,yxio->twipo", Sj,
                      kernel[dz].astype(jnp.float32)).reshape(
               4, 4, cin, 4 * cout).astype(
               jnp.float32 if quantized else dtype)
           for dz in range(3)]
    if quantized:
        x, sx = _quant_act(x, act_scale)
        k4s, sk = _quant_kernels(k4s)
    else:
        x = x.astype(dtype)
    xpd = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    if _disp_sharded():
        out = None
        for dz in range(3):
            y = conv2d_planes_nd(xpd[:, dz:dz + D], k4s[dz], (2, 2), pad2,
                                 pet=jnp.int32 if quantized else None)
            out = y if out is None else out + y
    else:
        out = None
        for dz in range(3):
            sl = xpd[:, dz:dz + D].reshape(N * D, H, W, cin)
            dn = jax.lax.conv_dimension_numbers(sl.shape, k4s[dz].shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = _conv(
                sl, k4s[dz], (2, 2), pad2, dimension_numbers=dn,
                preferred_element_type=jnp.int32 if quantized else None)
            out = y if out is None else out + y
        Hb = H // 2 + 1 if to_shifted else H // 2
        Wb = W // 2 + 1 if to_shifted else W // 2
        out = out.reshape(N, D, Hb, Wb, 4 * cout)
    if quantized:
        out = (out.astype(jnp.float32) * (sx * sk)).astype(dtype)
    return out


def zero_shift_halo(y: jnp.ndarray) -> jnp.ndarray:
    """Zero the out-of-image halo entries of a shifted packed tensor
    (full-res rows -1 / H live at block 0 phase 0 / block Hb-1 phase 1;
    likewise for W). Channel order (ph, pw, c), c = channels // 4.

    Fused iota-mask select instead of ``.at[].set(0)``: the six scatter
    updates lowered to ~24 full-buffer (393 MB) dynamic-update-slice ops
    per stage across fwd+VJP at the reference train recipe — the single
    largest standalone-glue block in the step's optimized HLO
    (scripts/perf_train_fat.py). The select is exact and fuses into the
    surrounding BN/ReLU elementwise work."""
    C = y.shape[-1] // 4
    Hb, Wb, C4 = y.shape[2], y.shape[3], y.shape[-1]
    h = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wb, C4), 0)
    w = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wb, C4), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wb, C4), 2)
    ph, pw = c // (2 * C), (c // C) % 2
    halo = (((h == 0) & (ph == 0)) | ((h == Hb - 1) & (ph == 1))
            | ((w == 0) & (pw == 0)) | ((w == Wb - 1) & (pw == 1)))
    return jnp.where(halo, jnp.zeros((), y.dtype), y)


def conv3d_k3_cout1_tapgemm(x: jnp.ndarray, kernel: jnp.ndarray,
                            dtype) -> jnp.ndarray:
    """k=3, stride-1, pad-1 conv3d with cout=1 as a 27-column tap GEMM.

    A single-output-channel conv leaves 127 of the MXU's 128 N-lanes idle;
    instead, one GEMM projects all 27 kernel taps at once (N=27) and the
    output combines shifted slices of the tap tensor — the same trick as
    `SubpixelSoftArgminHead`'s unpacked path. Used by the MS-PSMNet
    classifier heads (reference psmnet_3dcnn.py:166-172, nn.Conv3d(32,1))."""
    N, D, H, W, cin = x.shape
    k_all = kernel.reshape(27, cin).T.astype(dtype)          # [cin, 27]
    T = jax.lax.dot_general(x.astype(dtype), pmesh.replicate(k_all),
                            (((4,), (0,)), ((), ())))
    Tp = jnp.pad(T, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = None
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                t = (kd * 3 + kh) * 3 + kw
                # out[p] += T[p + k - 1, tap]; +1 from the pad
                sl = jax.lax.dynamic_slice(Tp, (0, kd, kh, kw, t),
                                           (N, D, H, W, 1))
                acc = sl if acc is None else acc + sl
    return acc


class Conv3D(nn.Module):
    """Bare 3-D conv (no bias), param path ``<name>/kernel``."""
    features: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        kernel = self.param("kernel", he_normal_msnets(self.kernel),
                            (self.kernel, self.kernel, self.kernel,
                             x.shape[-1], self.features))
        if self.features == 1 and self.kernel == 3 and self.stride == 1:
            y = conv3d_k3_cout1_tapgemm(x, kernel, self.dtype)
        else:
            y = conv3d_ndhwc(x, kernel, self.stride, p, self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class _KernelHolder(nn.Module):
    """Declares a conv kernel param under a named child scope so the parent
    can transform it (e.g. fold BN scales) before the convolution. Keeps the
    param tree identical to the Conv3D/Deconv3D submodule layout
    (``<name>/kernel``) that the torch checkpoint converter targets."""
    shape: Tuple[int, ...]
    kernel_size: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", he_normal_msnets(self.kernel_size),
                          self.shape)


def _bn_affine(bn: nn.Module, features: int):
    """Extract eval-mode BatchNorm as (a, b) with y = a*x + b per channel.

    Probes the bound BN module with zeros and ones — bn(0) = beta - mu*g,
    bn(1) - bn(0) = g where g = gamma/sqrt(var+eps) — so the affine is
    recovered without reaching into the child scope's variables. O(C) cost.
    """
    probe0 = jnp.zeros((1, 1, 1, 1, features), jnp.float32)
    b = bn(probe0)
    a = bn(jnp.ones_like(probe0)) - b
    return a.reshape(-1), b.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _phase_bn_apply(y, scale, bias, P, n):
    """Batch-stat normalization of a phase-packed volume (the differentiable
    core of PackedPhaseBN) with a hand-written VJP.

    Returns (out, mean, var) — the stats feed the running averages, so ONE
    pass computes both (a separate stop_gradient'd stats computation risks
    not CSE-ing with this forward and paying a second volume read).
    GRADIENT CAVEAT: cotangents arriving on mean/var are DISCARDED — they
    are only ever consumed by the undifferentiated running-average updates;
    do not differentiate through these outputs.

    Why custom: autodiff keeps the f32 upcast of the volume as a backward
    residual (plus f32 intermediates), which at train shapes stores GB-scale
    f32 copies per BN stage — the reason MS-PSMNet needed remat-all at the
    reference recipe. This VJP saves only the bf16/model-dtype input y and
    the per-channel (mean, inv) vectors; the f32 upcast is recomputed in
    backward, which is EXACT (upcasting the stored y reproduces the forward
    bit-for-bit). Halo semantics: callers zero out-of-image entries before
    the call and after it, so cotangents at halo positions are zeroed
    downstream; the sums here deliberately run over all positions with the
    logical divisor n, exactly like the forward.
    """
    return _phase_bn_fwd(y, scale, bias, P, n)[0]


def _phase_bn_fwd(y, scale, bias, P, n):
    C = scale.shape[0]
    # minor-dim split only: a flat reshape(-1, P, C) merges sharded
    # N/D/H/W dims and forces GSPMD to all-gather the volume
    # (scripts/scaling_analysis.py)
    s = y.reshape(y.shape[:-1] + (P, C))
    red = tuple(range(s.ndim - 1))
    # f32-ACCUMULATING reductions straight off the model-dtype tensor: the
    # bf16->f32 converts live inside the reduce fusions. The previous shared
    # `y.astype(f32)` materialized as standalone full-volume f32 converts
    # (~786 MB each, several per stage once XLA rematerialized it per
    # consumer) — the single largest block of the train step's composition
    # fat (scripts/perf_train_fat.py HLO attribution). Stats are unchanged:
    # a reduce that upcasts each element before accumulating is exactly the
    # old sum-of-upcasts.
    mean = jnp.sum(s, axis=red, dtype=jnp.float32) / n
    sq = jnp.sum(jnp.square(s.astype(jnp.float32)), axis=red) / n
    var = sq - mean * mean
    rinv = jax.lax.rsqrt(var + 1e-5)                  # gamma-free
    a = jnp.tile(rinv * scale, P)
    b = jnp.tile(bias - mean * rinv * scale, P)
    # the affine runs in the model dtype (constants fold to f32 when y is
    # f32 — bit-identical to the old form; bf16 pays one extra zero-mean
    # rounding on a value that was already rounded to bf16 on output)
    out = y * a.astype(y.dtype) + b.astype(y.dtype)
    return (out, mean, var), (y, scale, mean, rinv)


def _phase_bn_bwd(P, n, res, gs_all):
    g = gs_all[0]                 # cotangents on mean/var discarded (see
    y, scale, mean, rinv = res    # _phase_bn_apply docstring)
    C = scale.shape[0]
    sh = y.shape[:-1] + (P, C)
    red = tuple(range(len(sh) - 1))
    ys = y.reshape(sh)
    gs = g.reshape(sh)
    sg = jnp.sum(gs, axis=red, dtype=jnp.float32)     # [C]
    # sum(g * xhat) as ONE f32-accumulating fusion over the model-dtype
    # pair — no materialized f32 upcast of either volume (see _phase_bn_fwd)
    sgx = jnp.sum(gs.astype(jnp.float32)
                  * (ys.astype(jnp.float32) - mean) * rinv, axis=red)
    # dL/dy = gamma*rinv * (g - (sg + xhat*sgx)/n)  with xhat=(y-mean)*rinv
    #       = a1*g + c1*y + c0 per channel: pure model-dtype elementwise
    a1 = scale * rinv
    c1 = -scale * rinv * rinv * sgx / n
    c0 = -a1 * sg / n - c1 * mean
    dy = (g * jnp.tile(a1, P).astype(g.dtype)
          + y * jnp.tile(c1, P).astype(y.dtype)
          + jnp.tile(c0, P).astype(g.dtype))
    return dy, sgx, sg


_phase_bn_apply.defvjp(_phase_bn_fwd, _phase_bn_bwd)


class PackedPhaseBN(nn.Module):
    """Train-mode BatchNorm on a phase-packed volume [N, D, Hb, Wb, P*C]
    (channel order (phase, c)) with halo-masked statistics.

    Each logical channel c appears as P packed channels; batch statistics
    reduce over all P phase copies jointly so they equal the full-layout
    BatchNorm's stats exactly (up to fp reassociation). Shifted layouts
    carry an out-of-image halo whose entries are ZERO on input (callers run
    `zero_shift_halo`/`zero_w_halo` on the raw conv output first): zeros
    drop out of the sums, and the divisor is `valid_count` — the number of
    LOGICAL elements N*D*H*W — not the padded packed count, so the halo
    never pollutes mean/var. This is what makes the packed space-to-depth
    layouts usable in training, not just eval (reference trains with
    nn.BatchNorm3d over the full layout, gcnet_3dcnn.py:20-22).

    Variable tree matches flax ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var, all f32), so checkpoints are interchangeable with
    the eval path's BN and the torch converter.
    """
    features: int            # logical channel count C
    phases: int              # packed copies per logical channel (2/4/8)
    valid_count: int         # logical elements per channel (N*D*H*W)
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, y):
        C, P = self.features, self.phases
        assert self.epsilon == 1e-5, "custom VJP hardcodes eps=1e-5"
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        n = float(self.valid_count)
        # normalization runs through the custom-VJP core: autodiff would
        # keep the volume's f32 upcast (plus intermediates) as backward
        # residuals — GB-scale f32 copies per stage at train shapes, the
        # reason MS-PSMNet needed remat-all. The custom backward stores
        # only (y, mean, rinv) and re-upcasts y exactly. The core returns
        # the batch stats too, so ONE pass feeds both the affine and the
        # running averages (stats cotangents are discarded by the VJP —
        # fine: the ra updates are never differentiated).
        out, mean, var = _phase_bn_apply(y, scale, bias, P, n)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return out


class ConvBN3D(nn.Module):
    """conv3d (no bias) + BatchNorm (reference convbn_3d, gcnet_3dcnn.py:20-22).

    Eval mode folds the BN affine into the conv kernel and a bias
    (y = conv(x, k*g) + (beta - mu*g)): the BN stage otherwise costs a full
    f32 HBM round-trip of the volume (~2.7 ms at the deconvbn4 output shape,
    ~7 ms across all stages of a 512x256 D192 forward on v5e). Train mode
    keeps real batch-stat BN in f32.
    """
    features: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.float32
    quant: bool = False   # int8 eval of the packed lowerings (2.6x MXU rate
                          # on stem shapes, scripts/perf_int8_conv.py);
                          # train mode is never quantized. COVERAGE IS
                          # SHAPE-GATED: only the packed stride-1 lowerings
                          # and stride-2 convs that pass conv3d_ndhwc's
                          # >=1M-voxel / even-dims s2d gate actually run
                          # int8 — full-layout stride-1 convs and small
                          # stride-2 volumes (e.g. gcnet blocks 2-4,
                          # hourglass inner convs at bench shapes) stay
                          # bf16 because int8 doesn't pay there
                          # (memory-bound, scripts/perf_int8_conv.py).
    quant_mode: str = "dynamic"  # activation-scale regime when quant:
                          # "dynamic" per-sample max-abs pass;
                          # "calib"   bf16 compute + record input absmax
                          #           into quant_stats/act_amax (requires
                          #           mutable=["quant_stats"]);
                          # "static"  fixed scalar scale from quant_stats
                          #           (no max pass; the int8 cast fuses
                          #           into the producer). See ModelConfig.

    @nn.compact
    def __call__(self, x, train: bool, lin: str = "full", lout: str = "full"):
        """lin/lout select the tensor layout: "full" [N,D,H,W,C],
        "std"/"shift" the packed H,W space-to-depth layouts of
        `conv3d_s1_hw_packed`, "wshift" the W-only fold of
        `conv3d_s1_w_packed`. Both modes honor them: eval folds the BN
        affine into the packed kernels; train runs the packed conv with the
        raw kernel and `PackedPhaseBN` (halo-masked statistics), which is
        numerically the full-layout BatchNorm up to fp reassociation."""
        k = self.kernel
        packed_in = lin in ("std", "shift")
        cin = x.shape[-1] // (4 if packed_in else
                              2 if lin == "wshift" else 1)
        kernel = _KernelHolder((k, k, k, cin, self.features), k,
                               name="conv")()
        if train and k == 3 and self.stride == 1 and \
                (lin != "full" or lout != "full"):
            return self._train_packed(x, kernel, lin, lout)
        if train:
            if self.stride == 2 and k == 3 and lin == "std":
                # block entry conv consuming the packed stem (full output)
                x = conv3d_s2_hw_s2d(x, kernel.astype(self.dtype),
                                     self.dtype, packed_input=True)
            else:
                x = conv3d_ndhwc(x, kernel, self.stride, k // 2, self.dtype,
                                 force_s2d=(self.stride == 2))
            x = pmesh.constrain_volume(x)
            # full-layout BN through the fused custom core (P=1): flax
            # nn.BatchNorm on an f32 upcast materializes the upcast as
            # standalone full-volume converts/copies in fwd AND VJP (192 MB
            # each at block1's train shape, perf_train_fat.py); the core's
            # f32-accumulating reductions + model-dtype affine fuse instead.
            # Identical variable tree (bn/{scale,bias,mean,var}).
            n1 = int(np.prod(x.shape[:-1]))
            return PackedPhaseBN(self.features, 1, n1, name="bn")(
                x).astype(self.dtype)
        bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="bn")
        a, b = _bn_affine(bn, self.features)
        quant_run, ascale = self.quant, None
        if self.quant and self.quant_mode != "dynamic":
            # static/calib int8: one scalar scale per layer. The quantized
            # tensor inside every lowering is a reshape/zero-pad of x, so
            # max|x| over the module input is exactly the lowering input's
            # absmax regardless of layout.
            amax = self.variable("quant_stats", "act_amax",
                                 lambda: jnp.zeros((), jnp.float32))
            if self.quant_mode == "calib":
                quant_run = False        # record stats, compute in bf16
                if not self.is_initializing():
                    amax.value = jnp.maximum(
                        amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            else:
                assert self.quant_mode == "static", self.quant_mode
                # amax == 0 means the layer was never calibrated (quant_stats
                # fresh from init). A tiny epsilon scale would saturate every
                # activation at +-127 and silently collapse the conv output;
                # poison the scale to NaN instead so the failure is loud.
                # (The Evaluator treats all-zero quant_stats as uncalibrated
                # and never reaches this.)
                ascale = jnp.where(amax.value > 0, amax.value,
                                   jnp.nan) / 127.0
        kf = kernel.astype(jnp.float32) * a
        if not quant_run:        # quantized lowerings re-scale from f32
            kf = kf.astype(self.dtype)
        if (not train) and k == 3 and self.stride == 1 and \
                (lin == "wshift" or lout == "wshift"):
            # W-only packed layout: free fold/unfold reshapes at the module
            # boundary, 2x MXU N-util inside (block inner convs, cout 64)
            if lout == "wshift":                  # full -> wshift
                y = conv3d_s1_w_packed(w_fold(x), kf, self.dtype, True,
                                       quantized=quant_run, act_scale=ascale)
                y = y + jnp.tile(b, 2).astype(self.dtype)
                y = zero_w_halo(y)                # caller relus; relu(0)==0
            else:                                 # wshift -> full
                y = conv3d_s1_w_packed(x, kf, self.dtype, False,
                                       quantized=quant_run, act_scale=ascale)
                y = w_unfold(y + jnp.tile(b, 2).astype(self.dtype))
            return pmesh.constrain_volume(y)
        packed_out = (not train) and lin == "full" and lout in ("std", "shift")
        if (packed_in or packed_out) and self.stride == 1 and k == 3:
            if packed_out:
                y = conv3d_s1_full_to_packed(x, kf, self.dtype,
                                             to_shifted=(lout == "shift"),
                                             quantized=quant_run,
                                             act_scale=ascale)
            else:
                assert lin != lout, "packed s1 conv alternates std<->shift"
                y = conv3d_s1_hw_packed(x, kf, self.dtype,
                                        to_shifted=(lout == "shift"),
                                        quantized=quant_run,
                                        act_scale=ascale)
            y = y + jnp.tile(b, 4).astype(self.dtype)
            if lout == "shift":
                y = zero_shift_halo(y)   # callers relu after; relu(0) == 0
        elif packed_in and self.stride == 2 and k == 3:
            y = conv3d_s2_hw_s2d(x, kf, self.dtype, packed_input=True,
                                 quantized=quant_run, act_scale=ascale)
            y = y + b.astype(self.dtype)
        else:
            y = conv3d_ndhwc(x, kf, self.stride, k // 2, self.dtype,
                             quantized=quant_run and self.stride == 2,
                             act_scale=ascale)
            y = y + b.astype(self.dtype)
        return pmesh.constrain_volume(y)

    def _train_packed(self, x, kernel, lin: str, lout: str):
        """Train-mode packed stride-1 conv + `PackedPhaseBN`.

        Same packed lowerings as eval, but with the raw kernel (no BN fold)
        and real batch statistics. Shifted-layout halo entries are zeroed
        BEFORE the stats (the conv writes out-of-image garbage there) and
        re-zeroed after the affine, so downstream packed taps keep reading
        zero padding. Output stays in `lout`'s layout."""
        kr = kernel.astype(self.dtype)
        if lout == "wshift" or lin == "wshift":
            if lout == "wshift":                      # full -> wshift
                y = zero_w_halo(conv3d_s1_w_packed(w_fold(x), kr,
                                                   self.dtype, True))
                n = y.shape[0] * y.shape[1] * y.shape[2] * (2 * y.shape[3] - 2)
            else:                                     # wshift -> full (fold)
                y = conv3d_s1_w_packed(x, kr, self.dtype, False)
                n = y.shape[0] * y.shape[1] * y.shape[2] * (2 * y.shape[3])
            y = PackedPhaseBN(self.features, 2, n, name="bn")(y)
            if lout == "wshift":
                y = zero_w_halo(y)
            else:
                y = w_unfold(y)
            return pmesh.constrain_volume(y.astype(self.dtype))
        if lin == "full":                             # full -> std/shift
            y = conv3d_s1_full_to_packed(x, kr, self.dtype,
                                         to_shifted=(lout == "shift"))
        else:                                         # std <-> shift
            assert lin != lout, "packed s1 conv alternates std<->shift"
            y = conv3d_s1_hw_packed(x, kr, self.dtype,
                                    to_shifted=(lout == "shift"))
        if lout == "shift":
            y = zero_shift_halo(y)
            n = (y.shape[0] * y.shape[1]
                 * (2 * y.shape[2] - 2) * (2 * y.shape[3] - 2))
        else:
            n = y.shape[0] * y.shape[1] * (2 * y.shape[2]) * (2 * y.shape[3])
        y = PackedPhaseBN(self.features, 4, n, name="bn")(y)
        if lout == "shift":
            y = zero_shift_halo(y)
        return pmesh.constrain_volume(y.astype(self.dtype))


def _deconv_phase_taps(stride: int):
    """Per-output-phase kernel taps for ConvTranspose(k=3, p=1, op=s-1).

    With our pre-flipped kernel storage, y[s*m + r] = sum over (kd, off) in
    taps[r] of K[kd] @ x[m + off]. Derivation: correlation over the
    s-dilated, (1, s)-padded input; kd contributes to phase r iff
    (r + kd - 1) % s == 0, with off = (r + kd - 1) // s.
    """
    taps = []
    for r in range(stride):
        t = []
        for kd in range(3):
            if (r + kd - 1) % stride == 0:
                t.append((kd, (r + kd - 1) // stride))
        taps.append(t)
    return taps


def deconv3d_subpixel(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                      dtype) -> jnp.ndarray:
    """ConvTranspose3d(k=3, stride, padding=1, output_padding=stride-1)
    via subpixel phase decomposition.

    XLA's lhs_dilation lowering computes the transposed conv densely
    (stride^3-fold wasted MXU work); here each of the stride^3 output phases
    is a tiny stride-1 conv of the input with a kernel sub-block, then the
    phases are interleaved with a reshape. Measured ~8x fewer FLOPs at
    stride 2 (scripts/perf_conv3d.py).
    """
    N, D, H, W, cin = x.shape
    cout = kernel.shape[-1]
    s = stride
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    taps = _deconv_phase_taps(s)
    # pad +1 at the far end of every spatial dim (off can be +1)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))

    def phase(pz, ph, pw):
        acc = None
        for kz, oz in taps[pz]:
            for ky, oy in taps[ph]:
                for kx, ox in taps[pw]:
                    sl = jax.lax.dynamic_slice(
                        xp, (0, oz, oy, ox, 0), (N, D, H, W, cin))
                    k2 = kernel[kz, ky, kx]              # [cin, cout]
                    y = jax.lax.dot_general(
                        sl.astype(jnp.float32),
                        pmesh.replicate(k2.astype(jnp.float32)),
                        (((4,), (0,)), ((), ())))
                    acc = y if acc is None else acc + y
        if acc is None:
            acc = jnp.zeros((N, D, H, W, cout), jnp.float32)
        return acc

    phases = jnp.stack([
        jnp.stack([
            jnp.stack([phase(pz, ph, pw) for pw in range(s)], axis=3)
            for ph in range(s)], axis=2)
        for pz in range(s)], axis=1)
    # phases: [N, s, D, s, H, s, W, cout] -> interleave
    y = jnp.transpose(phases, (0, 2, 1, 4, 3, 6, 5, 7))
    return y.reshape(N, s * D, s * H, s * W, cout)


def _conv_shuffle_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) kernel -> packed block kernel
    K2[oz, oy, ox, ci, phase*cout + co] for the window-2 conv whose output
    channel group `phase` = (pz*2+ph)*2+pw holds the deconv's output phase
    (pz, ph, pw). Built with a static 0/1 selector so tracing costs one
    einsum, not 27 scatter updates."""
    cin, cout = kernel.shape[3], kernel.shape[4]
    taps = _deconv_phase_taps(2)          # per-dim (kd, off) pairs
    sel = np.zeros((2, 2, 2, 27, 8), np.float32)   # [oz,oy,ox,tap,phase]
    for pz in range(2):
        for ph in range(2):
            for pw in range(2):
                phase = (pz * 2 + ph) * 2 + pw
                for kz, oz in taps[pz]:
                    for ky, oy in taps[ph]:
                        for kx, ox in taps[pw]:
                            sel[oz, oy, ox, (kz * 3 + ky) * 3 + kx, phase] = 1
    kflat = kernel.reshape(27, cin, cout)
    k2 = jnp.einsum("zyxtp,tio->zyxipo", jnp.asarray(sel), kflat)
    return k2.reshape(2, 2, 2, cin, 8 * cout)


def deconv3d_s2_packed_out(x: jnp.ndarray, kernel: jnp.ndarray,
                           dtype) -> jnp.ndarray:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) with the output LEFT in packed
    phase layout [N, D, H, W, 8*cout], channels (pz, ph, pw, co): entry
    (B, phase) is the deconv output at full-res coordinate 2*B + phase.

    The depth-to-space interleave of the full-res output measured 6.5 ms of
    deconvbn4's 9.4 ms on v5e (scripts/perf_deconvbn4.py) — downstream
    consumers that accept the packed layout (skip-add + packed head) never
    pay it. Lowered as 2 depth-tap 2-D convs (contraction 4*cin, N=8*cout)
    summed, like conv3d_ndhwc's decomposition."""
    N, D, H, W, cin = x.shape
    cout = kernel.shape[-1]
    k2 = _conv_shuffle_kernel(kernel).astype(dtype)
    x = x.astype(dtype)
    xpd = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))

    # depth phase pz=0 has a single D-tap at offset 0 (_deconv_phase_taps),
    # so the bz=1 kernel's first channel half (pz=0 groups) is statically
    # zero — a runtime einsum XLA can't fold. Run bz=1 over the pz=1 half
    # only (N = 4*cout, still >= 128 lanes for cout >= 32): 25% fewer FLOPs.
    if _disp_sharded():
        out = conv2d_planes_nd(xpd[:, 0:D], k2[0], (1, 1), [(0, 1), (0, 1)])
        y1 = conv2d_planes_nd(xpd[:, 1:1 + D], k2[1][..., 4 * cout:],
                              (1, 1), [(0, 1), (0, 1)])
        return out + jnp.pad(y1, ((0, 0), (0, 0), (0, 0), (0, 0),
                                  (4 * cout, 0)))

    def c2d(bz, k):
        sl = xpd[:, bz:bz + D].reshape(N * D, H, W, cin)
        dn = jax.lax.conv_dimension_numbers(sl.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return _conv(sl, k, (1, 1), [(0, 1), (0, 1)], dimension_numbers=dn)

    out = c2d(0, k2[0])
    y1 = c2d(1, k2[1][..., 4 * cout:])
    out = out + jnp.pad(y1, ((0, 0), (0, 0), (0, 0), (4 * cout, 0)))
    return out.reshape(N, D, H, W, 8 * cout)


def deconv3d_s2_pz_slabs(x: jnp.ndarray, kernel: jnp.ndarray, dtype,
                         adds=None) -> tuple:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) emitting TWO depth-parity
    slabs S[t] = [N, D, H, W, 4*cout] (channels (ph, pw, c)): entry
    (B, ph, pw) of S[t] is the deconv output at full-res coordinate
    (2B + t, 2Bh + ph, 2Bw + pw).

    Versus `deconv3d_s2_packed_out`, the pz phase stays a separate D-major
    structure instead of a channel group, so a skip in conv2's packed-std
    layout [N, 2D, H, W, 4C] aligns via a FREE reshape view
    ([N, D, 2, H, W, 4C]) — no d_split_pack transpose (1.53 ms at bench
    shapes). `adds[t]` (optional, [N, D, H, W, 4*cout]) is summed
    into slab t's conv accumulator so the skip-add can fuse into the conv
    epilogue."""
    N, D, H, W, cin = x.shape
    cout = kernel.shape[-1]
    # out channels of _conv_shuffle_kernel are (pz, ph, pw, co)
    kpz = _conv_shuffle_kernel(kernel).astype(dtype).reshape(
        2, 2, 2, cin, 2, 4 * cout)
    x = x.astype(dtype)
    xpd = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    if _disp_sharded():
        slabs = []
        for t in range(2):
            acc = None if adds is None else adds[t].astype(dtype)
            for bz in range(2):
                if t == 0 and bz == 1:
                    continue      # statically zero kernel slice (below)
                y = conv2d_planes_nd(xpd[:, bz:bz + D], kpz[bz, ..., t, :],
                                     (1, 1), [(0, 1), (0, 1)])
                acc = y if acc is None else acc + y
            slabs.append(acc)
        return tuple(slabs)
    slabs = []
    for t in range(2):
        acc = (None if adds is None else
               adds[t].astype(dtype).reshape(N * D, H, W, 4 * cout))
        for bz in range(2):
            if t == 0 and bz == 1:
                # statically zero kernel slice: depth phase pz=0 has a
                # single tap (kd=1, off=0) — _deconv_phase_taps(2) — so no
                # weight reaches depth block offset 1. The kernel is a
                # runtime einsum, so XLA cannot see the zeros; skipping the
                # conv here drops 25% of the lowering's FLOPs outright.
                continue
            sl = xpd[:, bz:bz + D].reshape(N * D, H, W, cin)
            dn = jax.lax.conv_dimension_numbers(
                sl.shape, kpz[bz, ..., t, :].shape, ("NHWC", "HWIO", "NHWC"))
            y = _conv(
                sl, kpz[bz, ..., t, :], (1, 1), [(0, 1), (0, 1)],
                dimension_numbers=dn)
            acc = y if acc is None else acc + y
        slabs.append(acc.reshape(N, D, H, W, 4 * cout))
    return tuple(slabs)


def d_unsplit_pack(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `d_split_pack`: [N, D/2, Hb, Wb, 8C] packed-3d
    (qd, qh, qw, c) -> [N, D, Hb, Wb, 4C] packed-std (qh, qw, c).
    Major-axis move only (channels stay minor) — near-bandwidth."""
    N, Dp, Hb, Wb, C8 = y.shape
    ys = y.reshape(N, Dp, Hb, Wb, 2, C8 // 2)
    return jnp.transpose(ys, (0, 1, 4, 2, 3, 5)).reshape(
        N, 2 * Dp, Hb, Wb, C8 // 2)


def packed3d_interleave(y: jnp.ndarray) -> jnp.ndarray:
    """[N, D, H, W, 8C] packed-3d (qd, qh, qw, c) -> full [N, 2D, 2H, 2W, C]
    depth-to-space interleave (the tail of `deconv3d_conv_shuffle`)."""
    N, D, H, W, C8 = y.shape
    c = C8 // 8
    y = y.reshape(N, D, H, W, 2, 2, 2, c)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(N, 2 * D, 2 * H, 2 * W, c)


def d_split_pack(x: jnp.ndarray) -> jnp.ndarray:
    """[N, D, Hb, Wb, 4C] packed-std (qh, qw, c) -> [N, D/2, Hb, Wb, 8C]
    packed-3d (qd, qh, qw, c): folds the depth parity into channels so a
    full-res volume can meet a `deconv3d_s2_packed_out` output elementwise.
    Moves a major axis only (channels stay minor) — near-bandwidth on TPU,
    unlike the lane-crossing depth-to-space interleave."""
    N, D, Hb, Wb, C4 = x.shape
    xs = x.reshape(N, D // 2, 2, Hb, Wb, C4)
    return jnp.transpose(xs, (0, 1, 3, 4, 2, 5)).reshape(
        N, D // 2, Hb, Wb, 2 * C4)


def deconv3d_conv_shuffle(x: jnp.ndarray, kernel: jnp.ndarray,
                          dtype) -> jnp.ndarray:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) as ONE k=2^3 conv + pixel shuffle.

    Every output phase's taps live inside a 2x2x2 input window, so the 8
    phase outputs pack into a single conv with 8*cout output channels
    (contraction 8*cin — MXU-friendly), followed by a depth-to-space
    interleave. Does the transposed conv's sparse FLOPs exactly once,
    unlike XLA's dense lhs_dilation lowering (stride^3-fold waste).
    Lowered through `deconv3d_s2_packed_out` (2 depth-tap 2-D convs, which
    also skips the statically-zero pz=0/offset-1 kernel half) followed by
    the full depth-to-space interleave.
    """
    return packed3d_interleave(
        deconv3d_s2_packed_out(x, kernel, dtype).astype(dtype))


def deconv3d_ps_shuffle(x: jnp.ndarray, kernel: jnp.ndarray,
                        dtype) -> jnp.ndarray:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) via phase conv + PARTIAL shuffle.

    Same phase-packed conv as `deconv3d_s2_packed_out` (N = 8*cout — full
    MXU lane utilization, sparse FLOPs once), but the depth-to-space differs
    from `deconv3d_conv_shuffle`'s full interleave: only the pz and ph phase
    axes move into D and H (a major-axis transpose with the minor
    [W, 2*cout] block intact — near-bandwidth), while the pw phase stays
    folded into channels, where `w_unfold`'s free reshape makes the result
    full layout. Kills the lane-crossing pw x cout interleave that made
    conv_shuffle lose the integrated eval A/B (42.0 vs 44.2 pairs/s,
    PERF.md), and the downstream skip-add reads the 2*cout-channel folded
    form at full lane utilization.
    """
    N, D, H, W, cin = x.shape
    cout = kernel.shape[-1]
    y = deconv3d_s2_packed_out(x, kernel, dtype)       # (pz, ph, pw, co)
    y = y.reshape(N, D, H, W, 2, 2, 2 * cout)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))        # pz -> D, ph -> H
    return y.reshape(N, 2 * D, 2 * H, 2 * W, cout)


def deconv3d_apply(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                   dtype, mode: str = "dense") -> jnp.ndarray:
    """ConvTranspose3d(k, stride, padding=1, output_padding=stride-1) by
    lowering mode. "dense" (default): XLA lhs_dilation lowering — fastest
    end-to-end measured for the BN'd mid deconvs (conv_shuffle's
    depth-to-space transpose and wpack's misaligned W+1 convs both lose at
    the large deconvbn4 output; scripts/perf_deconv.py, perf_deconv_wpack.py).
    "conv_shuffle": one packed k=2^3 conv + pixel shuffle (sparse FLOPs).
    "subpixel": per-phase pointwise dots."""
    k = kernel.shape[0]
    s = stride
    if mode == "conv_shuffle" and k == 3 and s == 2:
        return deconv3d_conv_shuffle(x, kernel, dtype)
    if mode == "ps_shuffle" and k == 3 and s == 2:
        return deconv3d_ps_shuffle(x, kernel, dtype)
    if mode == "subpixel" and k == 3:
        return deconv3d_subpixel(x, kernel, s, dtype)
    pad_lo = k - 2            # k-1-padding, padding=1
    pad_hi = k - 2 + (s - 1)  # + output_padding = stride-1
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return _conv(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(1, 1, 1),
        padding=[(pad_lo, pad_hi)] * 3,
        lhs_dilation=(s, s, s),
        dimension_numbers=dn)


class Deconv3D(nn.Module):
    """ConvTranspose3d(k, stride, padding=1, output_padding=stride-1).
    Doubles (stride 2) or quadruples (stride 4) every spatial dim."""
    features: int
    stride: int = 2
    kernel: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32
    mode: str = "dense"

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param("kernel", he_normal_msnets(k),
                            (k, k, k, x.shape[-1], self.features))
        y = deconv3d_apply(x, kernel, self.stride, self.dtype, self.mode)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y.astype(self.dtype)


class DeconvBN3D(nn.Module):
    """deconv + BatchNorm (reference deconvbn_3d, gcnet_3dcnn.py:24-27).

    Eval mode folds the BN affine into the deconv kernel + bias, exactly as
    ConvBN3D does (the deconv is linear in its kernel's cout axis).

    ``mode`` selects the full-layout lowering (deconv3d_apply): "dense"
    (XLA lhs_dilation) or "conv_shuffle" (one k=2^3 packed conv + pixel
    shuffle — sparse FLOPs once). ``train_mode`` overrides it for the train
    branch: measured on v5e (scripts/perf_deconv3.py, perf_train_step.py,
    bench.py A/B), dense wins the integrated EVAL graph (44.2 vs 42.0
    pairs/s) while conv_shuffle wins the TRAIN step (186.5 vs 194.0
    ms/step at batch 2 — its k=2 conv VJP beats the dilated conv's)."""
    features: int
    stride: int = 2
    kernel: int = 3
    dtype: Any = jnp.float32
    mode: str = "dense"
    train_mode: str = ""           # "" -> use `mode` in train too

    @nn.compact
    def __call__(self, x, train: bool, lout: str = "full", skips=None):
        """lout="packed3d" (stride 2 only) returns the deconv output in
        `deconv3d_s2_packed_out`'s phase-packed layout [N, D, H, W, 8C];
        supported in train too (every deconv output position is in-image,
        so `PackedPhaseBN` needs no halo masking — the 8 phase copies just
        reduce jointly). lout="pzslab" (eval, stride 2) returns the PAIR of
        depth-parity slabs of `deconv3d_s2_pz_slabs`, with BN folded and
        the optional `skips` pair summed inside the conv epilogues (callers
        relu)."""
        k = self.kernel
        kernel = _KernelHolder((k, k, k, x.shape[-1], self.features), k,
                               name="deconv")()
        if lout == "pzslab":
            assert not train and self.stride == 2 and k == 3
            bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                              epsilon=1e-5, dtype=jnp.float32,
                              param_dtype=jnp.float32, name="bn")
            a, b = _bn_affine(bn, self.features)
            kf = (kernel.astype(jnp.float32) * a).astype(self.dtype)
            b4 = jnp.tile(b, 4).astype(self.dtype)
            adds = (None if skips is None else
                    tuple(s.astype(self.dtype) + b4 for s in skips))
            slabs = deconv3d_s2_pz_slabs(x, kf, self.dtype, adds)
            if skips is None:
                slabs = tuple(s + b4 for s in slabs)
            return tuple(pmesh.constrain_volume(s) for s in slabs)
        if train and lout == "packed3d" and self.stride == 2 and k == 3:
            y = deconv3d_s2_packed_out(x, kernel.astype(self.dtype),
                                       self.dtype)
            n = y.shape[0] * y.shape[1] * y.shape[2] * y.shape[3] * 8
            y = PackedPhaseBN(self.features, 8, n, name="bn")(y)
            return pmesh.constrain_volume(y.astype(self.dtype))
        if (train and (self.train_mode or self.mode) == "conv_shuffle"
                and self.stride == 2 and k == 3):
            # BN the PACKED conv output (channels 8C, no lane padding),
            # interleave in bf16 afterwards: the f32 BN convert of the
            # interleaved-layout tensor cost a 4x lane-pad blowup (3 GB
            # per hourglass deconv at the PSMNet reference recipe).
            # PackedPhaseBN's joint phase stats == full-layout BN stats
            # exactly (every deconv output position is in-image).
            y = deconv3d_s2_packed_out(x, kernel.astype(self.dtype),
                                       self.dtype)
            n = y.shape[0] * y.shape[1] * y.shape[2] * y.shape[3] * 8
            y = PackedPhaseBN(self.features, 8, n, name="bn")(y)
            y = packed3d_interleave(y.astype(self.dtype))
            return pmesh.constrain_volume(y)
        if train:
            x = deconv3d_apply(x, kernel, self.stride, self.dtype,
                               self.train_mode or self.mode)
            x = pmesh.constrain_volume(x)
            # fused P=1 custom-core BN — see ConvBN3D's train branch note
            n1 = int(np.prod(x.shape[:-1]))
            return PackedPhaseBN(self.features, 1, n1, name="bn")(
                x).astype(self.dtype)
        bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="bn")
        a, b = _bn_affine(bn, self.features)
        kf = (kernel.astype(jnp.float32) * a).astype(self.dtype)
        if lout == "packed3d" and self.stride == 2 and k == 3:
            y = deconv3d_s2_packed_out(x, kf, self.dtype)
            y = y + jnp.tile(b, 8).astype(self.dtype)
        else:
            y = deconv3d_apply(x, kf, self.stride, self.dtype, self.mode)
            y = y + b.astype(self.dtype)
        return pmesh.constrain_volume(y)


class Conv3DBlock(nn.Module):
    """3x (conv+BN+ReLU), first conv strided (gcnet_3dcnn.py:30-44)."""
    features: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.float32
    quant: bool = False
    quant_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x, train: bool, lin_first: str = "full"):
        # quant applies to the ENTRY conv only: its s2d lowering wins 1.52x
        # in int8 ([2,2,128,64] taps); the wshift inner convs LOSE (0.69x,
        # scripts/perf_int8_packed.py) so they stay bf16 unconditionally.
        x = nn.relu(ConvBN3D(self.features, self.stride, self.kernel,
                             self.dtype, self.quant, self.quant_mode,
                             name="convbn_3d_1")(
                                 x, train, lin_first, "full"))
        # the two stride-1 convs run in W-only packed layout (free
        # fold/unfold, 2x MXU N-util at cout 64); W must be even and >= 4.
        # Train uses the same lowering with halo-masked PackedPhaseBN.
        wpack = (self.kernel == 3
                 and x.shape[3] % 2 == 0 and x.shape[3] >= 4)
        l2out, l3in = ("wshift", "wshift") if wpack else ("full", "full")
        x = nn.relu(ConvBN3D(self.features, 1, self.kernel,
                             self.dtype, name="convbn_3d_2")(
                                 x, train, "full", l2out))
        x = nn.relu(ConvBN3D(self.features, 1, self.kernel,
                             self.dtype, name="convbn_3d_3")(
                                 x, train, l3in, "full"))
        return x


def _linear_resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """1-D linear resize with PyTorch align_corners=True semantics."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1 or in_size == 1:
        idx = jnp.zeros((out_size,), jnp.int32)
        return jnp.take(x, idx, axis=axis)
    src = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    lo = jnp.floor(src).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 2)
    w = (src - lo.astype(jnp.float32))
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, lo + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return a * (1.0 - w) + b * w


def resize_trilinear_align_corners(x: jnp.ndarray,
                                   out_dhw: Tuple[int, int, int],
                                   axes: Tuple[int, int, int] = (1, 2, 3)) -> jnp.ndarray:
    """Trilinear resize, align_corners=True (PyTorch F.interpolate parity,
    psmnet_3dcnn.py:153-168). Separable per-axis linear interpolation."""
    for ax, o in zip(axes, out_dhw):
        x = _linear_resize_axis(x, ax, o)
    return x


class SubpixelSoftArgminHead(nn.Module):
    """Fused deconv5 + softmax + soft-argmin for MS-GCNet.

    The final ConvTranspose3d(F -> 1, stride 2) produces a full-resolution
    [2D, 2H, 2W] logit volume that is consumed only by softmax over D and the
    disparity expectation. Interleaving the subpixel phases into that volume
    is pure data movement (the dense XLA deconv spent ~29 ms on it at bench
    shapes); instead this head computes, per output spatial phase (ph, pw),
    the softmax statistics directly over the two depth phases:

        disp = (sum_pz sum_m (2m+pz) * exp(L_pz[m] - gmax)) /
               (sum_pz sum_m             exp(L_pz[m] - gmax))

    and only interleaves the four final [H, W] disparity maps. Parameters
    are exactly Deconv3D's (kernel [3,3,3,F,1] pre-flipped + bias), so the
    checkpoint converter path 'deconv5' is unchanged. The bias shifts every
    logit equally and cancels in the softmax; it is accepted but unused.
    Numerics match deconv5+softmax+soft-argmin to fp-reassociation level
    (validated against the torch twin in tests/test_models.py).
    """
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, packed=False):
        """packed=False: full layout [N,D,H,W,C]. packed=True: packed-3d
        [N,Db,Hb,Wb,8C]. packed="pzslab": x is a PAIR of depth-parity slabs
        [N,Db,Hb,Wb,4C] (see `deconv3d_s2_pz_slabs`)."""
        if packed == "pzslab":
            assert self.stride == 2, "packed head supports stride 2"
            cin = x[0].shape[-1] // 4
        elif packed:
            assert self.stride == 2, "packed head supports stride 2"
            cin = x.shape[-1] // 8
        else:
            cin = x.shape[-1]
        kernel = self.param("kernel", he_normal_msnets(3), (3, 3, 3, cin, 1))
        self.param("bias", nn.initializers.zeros, (1,))  # parity; cancels
        if packed == "pzslab":
            return self._pzslab(x, kernel)
        if packed:
            return self._packed(x, kernel)
        N, D, H, W, _ = x.shape
        s = self.stride
        x = x.astype(self.dtype)
        taps = _deconv_phase_taps(s)
        # One GEMM projects all 27 kernel taps at once (27 separate M=1
        # GEMMs would re-read x 27 times); phases then combine shifted
        # slices of the tap tensor T.
        k_all = kernel.reshape(27, cin).T.astype(jnp.float32)  # [cin, 27]
        T = jax.lax.dot_general(x.astype(jnp.float32),
                                pmesh.replicate(k_all),
                                (((4,), (0,)), ((), ())))
        T = jnp.pad(T, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))

        def phase_logits(pz, ph, pw):
            acc = None
            for kz, oz in taps[pz]:
                for ky, oy in taps[ph]:
                    for kx, ox in taps[pw]:
                        tap = (kz * 3 + ky) * 3 + kx
                        sl = jax.lax.dynamic_slice(
                            T, (0, oz, oy, ox, tap), (N, D, H, W, 1))[..., 0]
                        acc = sl if acc is None else acc + sl
            if acc is None:
                acc = jnp.zeros((N, D, H, W), jnp.float32)
            return acc                                   # [N, D, H, W] f32

        d_idx = [jnp.arange(D, dtype=jnp.float32) * s + pz for pz in range(s)]
        disp_phases = []
        for ph in range(s):
            row = []
            for pw in range(s):
                ls = [phase_logits(pz, ph, pw) for pz in range(s)]
                gmax = ls[0].max(axis=1)
                for l in ls[1:]:
                    gmax = jnp.maximum(gmax, l.max(axis=1))
                num = jnp.zeros_like(gmax)
                den = jnp.zeros_like(gmax)
                for pz, l in enumerate(ls):
                    e = jnp.exp(l - gmax[:, None])
                    den = den + e.sum(axis=1)
                    num = num + jnp.einsum("ndhw,d->nhw", e, d_idx[pz])
                row.append(num / den)                    # [N, H, W]
            disp_phases.append(row)
        # interleave the s*s small disparity maps -> [N, s*H, s*W]
        grid = jnp.stack([jnp.stack(r, axis=0) for r in disp_phases], axis=0)
        # grid: [ph, pw, N, H, W] -> [N, H, ph, W, pw]
        grid = jnp.transpose(grid, (2, 3, 0, 4, 1))
        return grid.reshape(N, s * H, s * W)

    def _packed(self, x, kernel):
        """Head on packed-3d input [N, Db, Hb, Wb, 8*cin], channels
        (qd, qh, qw, c) — entry (B, q) is the volume at full input-res
        coordinate 2B + q (the layout `deconv3d_s2_packed_out` + skip-add
        leave the decoder output in).

        The whole deconv5 collapses to ONE window-2 block conv: logits for
        output phase p = (pz, ph, pw) at input coordinate m = 2B + q read
        input m + off, i.e. block B + ((q+off)>>1), parity (q+off)&1 — a
        static per-(p, q, tap) selector, so all 64 (p, q) logit channels come
        from a single conv with contraction 8*cin (vs the unpacked path's 27-
        channel tap GEMM at 3% MXU N-utilization, plus no 100 MB depth-to-
        space on the decoder output). Softmax statistics then reduce over
        (Db, pz, qd) jointly (the full 4*Db disparity states) per spatial
        phase, and only the four [N, Hb*2, Wb*2] disparity maps are
        interleaved at the end."""
        N, Db, Hb, Wb, c8 = x.shape
        cin = c8 // 8
        taps = _deconv_phase_taps(2)
        S = np.zeros((2, 2, 2, 8, 27, 64), np.float32)  # [b3, qin, tap, p*8+q]
        for pz in range(2):
            for ph in range(2):
                for pw in range(2):
                    p = (pz * 2 + ph) * 2 + pw
                    for qd in range(2):
                        for qh in range(2):
                            for qw in range(2):
                                q = (qd * 2 + qh) * 2 + qw
                                for kz, oz in taps[pz]:
                                    for ky, oy in taps[ph]:
                                        for kx, ox in taps[pw]:
                                            sd, sh, sw = qd + oz, qh + oy, qw + ox
                                            S[sd >> 1, sh >> 1, sw >> 1,
                                              ((sd & 1) * 2 + (sh & 1)) * 2 + (sw & 1),
                                              (kz * 3 + ky) * 3 + kx,
                                              p * 8 + q] = 1.0
        kflat = kernel.reshape(27, cin).astype(jnp.float32)
        kbig = jnp.einsum("zhwqtp,tc->zhwqcp", jnp.asarray(S), kflat)
        kbig = kbig.reshape(2, 2, 2, 8 * cin, 64).astype(self.dtype)

        # window-2 conv, decomposed into 2 depth-tap 2-D convs. The logit
        # tensor L is 100M elements at bench shapes: keeping it in the model
        # dtype (bf16) instead of f32 halves the HBM traffic of the conv
        # write + the two softmax passes (3.0 -> 2.25 ms measured,
        # scripts/perf_packed_head.py; max disparity diff 0.12 px on random
        # logits — far below bad-3 relevance). Reductions stay f32.
        xq = x.astype(self.dtype)
        xpd = jnp.pad(xq, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        L = None
        for bz in range(2):
            if _disp_sharded():
                # stays 5-D (merging N*Db here would re-fold the sharded
                # depth dim); the final L.reshape below accepts either rank
                y = conv2d_planes_nd(xpd[:, bz:bz + Db], kbig[bz], (1, 1),
                                     [(0, 1), (0, 1)], pet=self.dtype)
            else:
                sl = xpd[:, bz:bz + Db].reshape(N * Db, Hb, Wb, c8)
                dn = jax.lax.conv_dimension_numbers(
                    sl.shape, kbig[bz].shape, ("NHWC", "HWIO", "NHWC"))
                y = _conv(
                    sl, kbig[bz], (1, 1), [(0, 1), (0, 1)],
                    dimension_numbers=dn,
                    preferred_element_type=self.dtype)
            L = y if L is None else L + y
        # [N, Db, Hb, Wb, (pz, ph, pw, qd, qh, qw)]
        L = L.reshape(N, Db, Hb, Wb, 2, 2, 2, 2, 2, 2)
        red = (1, 4, 7)                       # Db, pz, qd: disparity states
        gmax = L.max(axis=red, keepdims=True).astype(jnp.float32)
        # e in model dtype with f32 accumulation — see _pzslab
        e = jnp.exp(L.astype(jnp.float32) - gmax).astype(self.dtype)
        ar2 = jnp.arange(2, dtype=jnp.float32)
        w = (4.0 * jnp.arange(Db, dtype=jnp.float32)[:, None, None]
             + ar2[None, :, None] + 2.0 * ar2[None, None, :])  # [Db, pz, qd]
        # numerator and denominator in ONE pass over e (stacked weight).
        # A broadcast-multiply + reduce form (fusing exp into the pass so e
        # never materializes) benchmarked FLAT vs this einsum at bench
        # shapes (44.6-45.2 pairs/s both, ABAB) — XLA already keeps this
        # off the critical path, so the simpler einsum stays. Weight dtype
        # gate: see _pzslab (bf16 integer-exact only to 256).
        wdt = self.dtype if 4 * Db - 1 <= 256 else jnp.float32
        w2 = jnp.stack([w, jnp.ones_like(w)], axis=-1).astype(wdt)
        nd = jnp.einsum("nahwzyxdef,azdk->nhwyxefk", e, w2,
                        preferred_element_type=jnp.float32)
        disp = nd[..., 0] / nd[..., 1]        # [N, Hb, Wb, ph, pw, qh, qw]
        # output row = 4*Bh + 2*qh + ph, col = 4*Bw + 2*qw + pw
        out = jnp.transpose(disp, (0, 1, 5, 3, 2, 6, 4))
        return out.reshape(N, 4 * Hb, 4 * Wb)

    def _pzslab(self, slabs, kernel):
        """Head on a pair of depth-parity slabs S[t] = [N, Db, Hb, Wb, 4cin]
        (channels (qh, qw, c); entry (B, t) = volume depth 2B + t — the
        layout `deconv3d_s2_pz_slabs` + free-reshape skip-add leave the
        decoder output in, with no d_split_pack repack).

        Logits for output phase p = (pz, ph, pw) at volume depth m = 2B + qd
        read depth m + oz, i.e. slab (qd+oz)&1 at block B + ((qd+oz)>>1), so
        the window-2 block conv of `_packed` becomes FOUR 2-D convs grouped
        by (source slab s, depth block offset bd) — same total contraction.
        Each slab is W-FOLDED (free reshape) so the conv's N dim stays 128
        (out channels (u_out, p, q) = 2*8*8). Softmax statistics then reduce
        over (Db, pz, qd) per spatial phase exactly as in `_packed`."""
        S0, S1 = slabs
        N, Db, Hb, Wb, c4 = S0.shape
        assert Wb % 2 == 0, "pzslab head needs even Wb for the W-fold"
        cin = c4 // 4
        taps = _deconv_phase_taps(2)
        # selector [s, bd, bh(2), dx'(2), u_in, hph, wph, tap, u_out, p, q]
        sel = np.zeros((2, 2, 2, 2, 2, 2, 2, 27, 2, 8, 8), np.float32)
        for pz in range(2):
            for ph in range(2):
                for pw in range(2):
                    p = (pz * 2 + ph) * 2 + pw
                    for qd in range(2):
                        for qh in range(2):
                            for qw in range(2):
                                q = (qd * 2 + qh) * 2 + qw
                                for kz, oz in taps[pz]:
                                    for ky, oy in taps[ph]:
                                        for kx, ox in taps[pw]:
                                            t = (kz * 3 + ky) * 3 + kx
                                            s = (qd + oz) & 1
                                            bd = (qd + oz) >> 1
                                            bh = (qh + oy) >> 1
                                            hph = (qh + oy) & 1
                                            for uo in range(2):
                                                wb = uo + ((qw + ox) >> 1)
                                                sel[s, bd, bh, wb >> 1,
                                                    wb & 1, hph,
                                                    (qw + ox) & 1, t,
                                                    uo, p, q] = 1.0
        kflat = kernel.reshape(27, cin).astype(jnp.float32)
        kg = jnp.einsum("sbhxuvwtopq,tc->sbhxuvwcopq",
                        jnp.asarray(sel), kflat)
        # -> spatial window (bh, dx'); in channels (u_in, qh, qw, c)
        kg = kg.reshape(2, 2, 2, 2, 8 * cin, 128).astype(self.dtype)

        if _disp_sharded():
            # 5-D slabs so the sharded Db dim never folds into batch; the
            # final L.reshape below accepts either rank
            Sf5 = [sv.astype(self.dtype).reshape(N, Db, Hb, Wb // 2,
                                                 2 * c4)
                   for sv in (S0, S1)]
            L = None
            for s_i in range(2):
                for bd in range(2):
                    if s_i == 1 and bd == 1:
                        continue      # statically zero (see below)
                    src = Sf5[s_i]
                    if bd:
                        src = jnp.pad(src[:, 1:], ((0, 0), (0, 1), (0, 0),
                                                   (0, 0), (0, 0)))
                    y = conv2d_planes_nd(src, kg[s_i, bd], (1, 1),
                                         [(0, 1), (0, 1)], pet=self.dtype)
                    L = y if L is None else L + y
            L = L.reshape(N, Db, Hb, Wb // 2, 2, 2, 2, 2, 2, 2, 2)
            return self._pzslab_tail(L, Db, N, Hb, Wb)
        Sf = [s.astype(self.dtype).reshape(N * Db, Hb, Wb // 2, 2 * c4)
              for s in (S0, S1)]
        L = None
        for s in range(2):
            for bd in range(2):
                if s == 1 and bd == 1:
                    # statically zero: source slab/offset (s, bd) encodes
                    # qd + oz = 2*bd + s, and qd, oz are both in {0, 1} —
                    # qd + oz == 3 is unreachable, so sel[1, 1] has no
                    # entries. Skipping drops 25% of the head conv FLOPs
                    # (the kernel is a runtime einsum; XLA can't see it).
                    continue
                src = Sf[s]
                if bd:                      # depth block B+1: shift slab up
                    src = jnp.pad(
                        src.reshape(N, Db, Hb, Wb // 2, -1)[:, 1:],
                        ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
                    src = src.reshape(N * Db, Hb, Wb // 2, -1)
                dn = jax.lax.conv_dimension_numbers(
                    src.shape, kg[s, bd].shape, ("NHWC", "HWIO", "NHWC"))
                y = _conv(
                    src, kg[s, bd], (1, 1), [(0, 1), (0, 1)],
                    dimension_numbers=dn, preferred_element_type=self.dtype)
                L = y if L is None else L + y
        # [N, Db, Hb, W'b, (u, pz, ph, pw, qd, qh, qw)]
        L = L.reshape(N, Db, Hb, Wb // 2, 2, 2, 2, 2, 2, 2, 2)
        return self._pzslab_tail(L, Db, N, Hb, Wb)

    def _pzslab_tail(self, L, Db, N, Hb, Wb):
        """Softmax statistics + soft-argmin over the pzslab logit tensor
        [N, Db, Hb, W'b, (u, pz, ph, pw, qd, qh, qw)] (shared by the
        single-device and disp-sharded conv branches)."""
        red = (1, 5, 8)                       # Db, pz, qd
        gmax = L.max(axis=red, keepdims=True).astype(jnp.float32)
        # e is stored in the model dtype: in bf16 it halves the HBM traffic
        # of the 100M-element write + the einsum read; the num/den sums
        # accumulate in f32 (preferred_element_type), so the per-term ~0.4%
        # rounding averages out — same envelope as the bf16 logits choice
        # (~0.1 px on random logits, inert at bad-3).
        e = jnp.exp(L.astype(jnp.float32) - gmax).astype(self.dtype)
        ar2 = jnp.arange(2, dtype=jnp.float32)
        w = (4.0 * jnp.arange(Db, dtype=jnp.float32)[:, None, None]
             + ar2[None, :, None] + 2.0 * ar2[None, None, :])
        # one-pass num/den einsum (a fused reduce form measured FLAT here
        # too — see _packed). The disparity weights stay in model dtype only
        # while exactly representable there (bf16 is integer-exact to 256,
        # i.e. max_disp <= 257); above that they stay f32 so the soft-argmin
        # numerator carries no rounding bias at large disparities.
        wdt = self.dtype if 4 * Db - 1 <= 256 else jnp.float32
        w2 = jnp.stack([w, jnp.ones_like(w)], axis=-1).astype(wdt)
        nd = jnp.einsum("nahwuzyxdef,azdk->nhwuyxefk", e, w2,
                        preferred_element_type=jnp.float32)
        disp = nd[..., 0] / nd[..., 1]  # [N, Hb, W'b, u, ph, pw, qh, qw]
        # row = 4Bh + 2qh + ph; col = 4(2B'w + u) + 2qw + pw
        out = jnp.transpose(disp, (0, 1, 6, 4, 2, 3, 7, 5))
        return out.reshape(N, 4 * Hb, 4 * Wb)


def soft_argmin(logits_ndhw: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """softmax over D + expectation sum_d d*p(d).

    Matches GCNet disparityregression (gcnet_3dcnn.py:126-141): the *raw*
    network output goes through softmax (similarity convention), then the
    disparity expectation. Input [N, D, H, W] float; output [N, H, W].
    """
    N, D, H, W = logits_ndhw.shape
    assert D == max_disp, f"{D} != {max_disp}"
    p = jax.nn.softmax(logits_ndhw.astype(jnp.float32), axis=1)
    d = jnp.arange(max_disp, dtype=jnp.float32).reshape(1, max_disp, 1, 1)
    return jnp.sum(p * d, axis=1)
