"""MS-PSMNet: PSMNet-style stacked-hourglass 3-D cost-volume regularizer.

Architecture parity with the *intended* reference PSMNet_CostVolumeAggre
(src/models/psmnet_3dcnn.py:92-179). The reference as committed is broken
(SURVEY.md §2.4-1): dres0 declares 64 input channels vs the 8-channel MS
volume, ``forward`` references an undefined ``left`` for upsample sizing, and
``__init__`` rejects the trainer's kwarg. We implement the intended model:

    dres0: 2x (conv+BN+ReLU)                 in_ch -> 32 -> 32
    dres1: (conv+BN+ReLU, conv+BN) residual  32 -> 32 (+cost0)
    3x hourglass(32) with pre/post skip wiring (psmnet_3dcnn.py:47-89,136-143)
    3 classifier heads: conv+BN+ReLU + conv3d(32->1) with cumulative sums
    trilinear upsample (align_corners=True) to [max_disp, H_full, W_full]
    softmax over D + soft-argmin per head

Training returns (pred1, pred2, pred3) for the 0.2/0.6/1.0 loss weighting
(main_msnet.py:396-405); eval returns pred3 only.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBN3D, Deconv3D, hw_unpack,
                     resize_trilinear_align_corners, soft_argmin)


class Hourglass(nn.Module):
    """2-level 3-D hourglass (psmnet_3dcnn.py:47-89)."""
    inplanes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool,
                 lin_first: str = "full"):
        c = self.inplanes
        dt = self.dtype
        out = nn.relu(ConvBN3D(2 * c, 2, dtype=dt, name="conv1")(
            x, train, lin_first, "full"))
        pre = ConvBN3D(2 * c, 1, dtype=dt, name="conv2")(out, train)
        if postsqu is not None:
            pre = nn.relu(pre + postsqu)
        else:
            pre = nn.relu(pre)

        out = nn.relu(ConvBN3D(2 * c, 2, dtype=dt, name="conv3")(pre, train))
        out = nn.relu(ConvBN3D(2 * c, 1, dtype=dt, name="conv4")(out, train))

        up = Deconv3D(2 * c, dtype=dt, name="conv5_deconv")(out)
        up = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32,
                          name="conv5_bn")(up.astype(jnp.float32)).astype(dt)
        if presqu is not None:
            post = nn.relu(up + presqu)
        else:
            post = nn.relu(up + pre)

        out = Deconv3D(c, dtype=dt, name="conv6_deconv")(post)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           name="conv6_bn")(out.astype(jnp.float32)).astype(dt)
        return out, pre, post


class _Classifier(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from .layers import Conv3D
        x = nn.relu(ConvBN3D(32, 1, dtype=self.dtype, name="convbn")(x, train))
        return Conv3D(1, 1, 3, self.dtype, name="conv")(x)


class MSPSMNet(nn.Module):
    max_disp: int = 192
    in_channels: int = 8
    # upscale factor from the volume resolution to full resolution
    # (2 for half-res MS features, 4 for quarter-res)
    upscale: int = 2
    dtype: Any = jnp.float32
    remat: bool = False
    packed_train: bool = True      # packed dres layouts in train too
                                   # (PackedPhaseBN halo-masked statistics)

    @nn.compact
    def __call__(self, cv, train: bool = False):
        """cv: [N, D_in, H_in, W_in, C] ->
        train: (pred1, pred2, pred3) each [N, H_full, W_full]; eval: pred3."""
        dt = self.dtype
        x = cv.astype(dt)
        N, D_in, H_in, W_in, _ = x.shape
        full = (self.max_disp, H_in * self.upscale, W_in * self.upscale)

        # The dres chain is 4 stride-1 cout=32 convs over the FULL-res
        # volume — the same 25%-MXU-utilization shape as the MS-GCNet stem —
        # so it runs in the packed 2x2 H,W space-to-depth layout (1.78x
        # padded FLOPs for 4x N-lane utilization; layers.py). The first
        # hourglass consumes the packed tensor directly via its stride-2
        # entry conv; the hourglass skip-adds need the full layout, so the
        # packed cost0 is unpacked ONCE (a 50 MB depth-to-space at bench
        # shapes, vs ~4 full-volume convs saved).
        use_packed = ((not train or self.packed_train)
                      and H_in % 2 == 0 and W_in % 2 == 0
                      and H_in >= 4 and W_in >= 4)
        if use_packed:
            h = nn.relu(ConvBN3D(32, 1, dtype=dt, name="dres0_1")(
                x, train, "full", "shift"))
            cost0p = nn.relu(ConvBN3D(32, 1, dtype=dt, name="dres0_2")(
                h, train, "shift", "std"))
            h = nn.relu(ConvBN3D(32, 1, dtype=dt, name="dres1_1")(
                cost0p, train, "std", "shift"))
            h = ConvBN3D(32, 1, dtype=dt, name="dres1_2")(
                h, train, "shift", "std")
            cost0p = h + cost0p
            cost0 = hw_unpack(cost0p)
            hg1_in, hg1_lin = cost0p, "std"
        else:
            h = nn.relu(ConvBN3D(32, 1, dtype=dt, name="dres0_1")(x, train))
            cost0 = nn.relu(ConvBN3D(32, 1, dtype=dt, name="dres0_2")(h, train))
            h = nn.relu(ConvBN3D(32, 1, dtype=dt, name="dres1_1")(cost0, train))
            h = ConvBN3D(32, 1, dtype=dt, name="dres1_2")(h, train)
            cost0 = h + cost0
            hg1_in, hg1_lin = cost0, "full"

        hg = Hourglass
        if self.remat:
            hg = nn.remat(Hourglass, static_argnums=(4, 5))
        out1, pre1, post1 = hg(32, dtype=dt, name="dres2")(
            hg1_in, None, None, train, hg1_lin)
        out1 = out1 + cost0
        out2, _, post2 = hg(32, dtype=dt, name="dres3")(
            out1, pre1, post1, train, "full")
        out2 = out2 + cost0
        out3, _, _ = hg(32, dtype=dt, name="dres4")(
            out2, pre1, post2, train, "full")
        out3 = out3 + cost0

        cost1 = _Classifier(dtype=dt, name="classif1")(out1, train)
        cost2 = _Classifier(dtype=dt, name="classif2")(out2, train) + cost1
        cost3 = _Classifier(dtype=dt, name="classif3")(out3, train) + cost2

        def regress(c):
            # [N, D_in, H_in, W_in, 1] -> upsample -> [N, D, H, W] -> disparity
            up = resize_trilinear_align_corners(
                c.astype(jnp.float32), full, axes=(1, 2, 3))
            return soft_argmin(jnp.squeeze(up, -1), self.max_disp)

        pred3 = regress(cost3)
        if train:
            return regress(cost1), regress(cost2), pred3
        return pred3
