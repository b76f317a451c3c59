"""2-D conv / correlation building blocks (reference src/models/basic_convs.py).

The reference keeps a library of 2-D blocks for its DispNetC/iResNet model
variants; none are used by the MS-Nets main path (SURVEY.md §2.2), but they
are part of the framework surface, so TPU-native equivalents live here.

Layout is channels-last [N, H, W, C] (TPU-native); correlation outputs use
the disparity-first [N, D, H, W] convention of the reference so downstream
cost-volume code is interchangeable.

Parity notes:
  * correlation1d_map: basic_convs.py:20-66 — corr[n, d, i, j] =
    sum_c L[n, c, i, j] * R[n, c, i, j - d], zero where j < d (zero pad).
  * corr1d: basic_convs.py:70-101 — same product-sum but rows j < d keep
    their zero initialization (no shift validity pad) and an optional
    avg-pool smoothing over the map; `stride` strides the disparity axis.
  * conv/upconv helpers: basic_convs.py:106-277 — conv3x3/conv1x1/
    downsample (stride-2) convs and 3x3/4x4 transposed convs, each with
    optional BatchNorm+ReLU. ConvTranspose2d(k=3, s=2, p=1, out_p=1) and
    (k=4, s=2, p=1) both double H/W exactly.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import he_normal_msnets


def correlation1d_map(x: jnp.ndarray, y: jnp.ndarray,
                      maxdisp: int) -> jnp.ndarray:
    """1-D correlation cost map (basic_convs.py:20-66).

    x, y: left/right feature maps [N, H, W, C] -> corr [N, D, H, W] with
    corr[:, d, :, j] = sum_c x[..., j, c] * y[..., j-d, c] and zeros where
    the shift runs off the left edge.
    """
    N, H, W, C = x.shape
    yp = jnp.pad(y, ((0, 0), (0, 0), (maxdisp - 1, 0), (0, 0)))
    # gather all D shifted right views: [N, H, W, D, C]
    cols = jnp.arange(W)[:, None] + (maxdisp - 1) - jnp.arange(maxdisp)[None, :]
    shifted = yp[:, :, cols, :]                      # [N, H, W, D, C]
    corr = jnp.einsum("nhwc,nhwdc->ndhw", x, shifted)
    return corr


def corr1d(fL: jnp.ndarray, fR: jnp.ndarray, D: int, stride: int = 1,
           kernel_size: int = 1,
           simfun: Optional[Callable] = None) -> jnp.ndarray:
    """Corr1d_V2 (basic_convs.py:70-101): [N, H, W, C] pair -> [N, D, H, W].

    Channel i correlates at column shift i*stride; columns j < i*stride
    keep the zero fill (the reference writes into a zeros tensor). With
    kernel_size > 1 the map is mean-filtered (AvgPool2d, stride 1,
    'same' zero padding) over H, W.
    """
    N, H, W, C = fL.shape
    if simfun is None:
        simfun = lambda a, b: jnp.sum(a * b, axis=-1)
    rows = []
    for i in range(D):
        s = i * stride
        if i >= W:
            rows.append(jnp.zeros((N, H, W), fL.dtype))
            continue
        m = simfun(fL[:, :, s:, :], fR[:, :, : W - s if s else W, :])
        rows.append(jnp.pad(m, ((0, 0), (0, 0), (s, 0))))
    corr = jnp.stack(rows, axis=1)                   # [N, D, H, W]
    if kernel_size > 1:
        assert kernel_size % 2 == 1
        p = kernel_size // 2
        x = corr.reshape(N * D, H, W, 1)
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        s = jax.lax.reduce_window(xp, 0.0, jax.lax.add,
                                  (1, kernel_size, kernel_size, 1),
                                  (1, 1, 1, 1), "VALID")
        corr = (s / (kernel_size * kernel_size)).reshape(N, D, H, W)
    return corr


class ConvBlock2D(nn.Module):
    """conv2d (+BN)(+ReLU): conv3x3/conv1x1/downsample_conv[_bn]
    (basic_convs.py:106-205)."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=not self.use_bn, dtype=self.dtype,
                    kernel_init=he_normal_msnets(self.kernel),
                    name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             name="bn")(x.astype(jnp.float32))
            x = x.astype(self.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x


class UpconvBlock2D(nn.Module):
    """transposed conv2d (+BN)(+ReLU), H/W doubling: upconv3x3/upconv4x4/
    deconv2d[_bn] (basic_convs.py:125-277). kernel 3 uses output_padding 1
    (PyTorch p=1, out_p=1); kernel 4 uses p=1 — both give exactly 2x."""
    features: int
    kernel: int = 4
    use_bn: bool = True
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        # lhs-dilated conv formulation: pad lo = k-1-p, hi = k-1-p+out_p
        pad_lo = k - 2
        pad_hi = (k - 1) if k == 3 else (k - 2)
        kernel = self.param(
            "kernel", he_normal_msnets(k),
            (k, k, x.shape[-1], self.features))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(pad_lo, pad_hi)] * 2, lhs_dilation=(2, 2),
            dimension_numbers=dn)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             name="bn")(y.astype(jnp.float32))
            y = y.astype(self.dtype)
        else:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        if self.use_relu:
            y = nn.relu(y)
        return y
