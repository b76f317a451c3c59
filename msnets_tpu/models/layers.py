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

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


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


class ConvBN3D(nn.Module):
    """conv3d (no bias) + BatchNorm (reference convbn_3d, gcnet_3dcnn.py:20-22)."""
    features: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel,) * 3,
                    strides=(self.stride,) * 3,
                    padding=[(p, p)] * 3,
                    use_bias=False,
                    kernel_init=he_normal_msnets(self.kernel),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x.astype(jnp.float32))
        return x.astype(self.dtype)


class Deconv3D(nn.Module):
    """ConvTranspose3d(k, stride, padding=1, output_padding=stride-1) as an
    input-dilated conv. Doubles (stride 2) or quadruples (stride 4) dims."""
    features: int
    stride: int = 2
    kernel: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        pad_lo = k - 2          # k-1-padding, padding=1
        pad_hi = k - 2 + (s - 1)  # + output_padding = stride-1
        kernel = self.param("kernel", he_normal_msnets(k),
                            (k, k, k, x.shape[-1], self.features))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=[(pad_lo, pad_hi)] * 3,
            lhs_dilation=(s, s, s),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y.astype(self.dtype)


class DeconvBN3D(nn.Module):
    """deconv + BatchNorm (reference deconvbn_3d, gcnet_3dcnn.py:24-27)."""
    features: int
    stride: int = 2
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = Deconv3D(self.features, self.stride, self.kernel,
                     dtype=self.dtype, name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x.astype(jnp.float32))
        return x.astype(self.dtype)


class Conv3DBlock(nn.Module):
    """3x (conv+BN+ReLU), first conv strided (gcnet_3dcnn.py:30-44)."""
    features: int
    stride: int = 1
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.relu(ConvBN3D(self.features, self.stride, self.kernel,
                             self.dtype, name="convbn_3d_1")(x, train))
        x = nn.relu(ConvBN3D(self.features, 1, self.kernel,
                             self.dtype, name="convbn_3d_2")(x, train))
        x = nn.relu(ConvBN3D(self.features, 1, self.kernel,
                             self.dtype, name="convbn_3d_3")(x, train))
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
