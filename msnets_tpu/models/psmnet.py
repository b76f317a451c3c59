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

from .layers import (ConvBN3D, DeconvBN3D, d_unsplit_pack, hw_unpack,
                     resize_trilinear_align_corners, soft_argmin)


class Hourglass(nn.Module):
    """2-level 3-D hourglass (psmnet_3dcnn.py:47-89).

    conv5/conv6 are DeconvBN3D stages: eval folds their BN affine into the
    deconv kernels (no f32 full-volume BN round-trips), and train lowers
    them via conv_shuffle — the dense lhs_dilation lowering materializes
    bf16 intermediates in a channels-non-minor layout with a 4x
    lane-padding blowup (1.6 GB each at the reference recipe, the OOM
    driver at crop 256x512 batch 2), and its VJP also lost the GCNet A/B
    (PERF.md). ``remat_stages`` rematerializes each conv/deconv+BN stage
    individually so the backward's live set stays one stage deep."""
    inplanes: int
    dtype: Any = jnp.float32
    deconv_mode_train: str = "conv_shuffle"
    remat_stages: bool = False
    quant: bool = False   # int8 eval of the stride-2 entry convs (their
                          # s2d lowering wins 1.52x, perf_int8_packed.py);
                          # stride-1/deconv stages stay bf16
    quant_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool,
                 lin_first: str = "full", lout: str = "full"):
        c = self.inplanes
        dt = self.dtype
        cbn, dbn = ConvBN3D, DeconvBN3D
        if self.remat_stages:
            cbn = nn.remat(ConvBN3D, static_argnums=(2, 3, 4))
            dbn = nn.remat(DeconvBN3D, static_argnums=(2, 3))
        out = nn.relu(cbn(2 * c, 2, dtype=dt, quant=self.quant,
                          quant_mode=self.quant_mode, name="conv1")(x, train, lin_first, "full"))
        pre = cbn(2 * c, 1, dtype=dt, name="conv2")(out, train, "full", "full")
        if postsqu is not None:
            pre = nn.relu(pre + postsqu)
        else:
            pre = nn.relu(pre)

        out = nn.relu(cbn(2 * c, 2, dtype=dt, quant=self.quant,
                          quant_mode=self.quant_mode, name="conv3")(pre, train, "full", "full"))
        out = nn.relu(cbn(2 * c, 1, dtype=dt, name="conv4")(
            out, train, "full", "full"))

        up = dbn(2 * c, dtype=dt, train_mode=self.deconv_mode_train,
                 name="conv5")(out, train, "full")
        if presqu is not None:
            post = nn.relu(up + presqu)
        else:
            post = nn.relu(up + pre)

        if lout == "std":
            # emit the output volume in packed-std layout: conv6's deconv
            # output stays phase-packed (packed3d; PackedPhaseBN in train,
            # folded-BN packed deconv in eval) and only the depth parity is
            # unfolded — a near-bandwidth major move. Keeps the full-res
            # outer graph (skip adds, classifiers) in 128-channel packed
            # tensors: full-layout 32-channel volumes pay a 4x MXU
            # lane-padding blowup in HBM on v5e (train OOM driver; in eval
            # it is 4x wasted volume bandwidth per touch).
            yp = dbn(c, dtype=dt, train_mode=self.deconv_mode_train,
                     name="conv6")(post, train, "packed3d")
            return d_unsplit_pack(yp), pre, post
        out = dbn(c, dtype=dt, train_mode=self.deconv_mode_train,
                  name="conv6")(post, train, "full")
        return out, pre, post


class _Classifier(nn.Module):
    """convbn+ReLU then Conv3d(32->1) (reference psmnet_3dcnn.py:111-121).

    lin="std" consumes a packed-std volume: convbn runs std->shift, the
    cout=1 conv runs shift->std in packed space (its taps read the zeroed
    shift halo as padding), and the tiny 4-channel result is interleaved
    to [N, D, H, W, 1]. Param tree is identical to the full path."""
    features: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, lin: str = "full"):
        from .layers import (Conv3D, _KernelHolder, conv3d_s1_hw_packed,
                             hw_unpack)
        F = self.features
        if lin == "std":
            h = nn.relu(ConvBN3D(F, 1, dtype=self.dtype, name="convbn")(
                x, train, "std", "shift"))
            kernel = _KernelHolder((3, 3, 3, F, 1), 3, name="conv")()
            # the cout=1 packed conv (N=4 MXU lanes) is this head's
            # measured floor: a full-lane tap-projection form (one [4C,108]
            # block-diag GEMM + 27 slice-adds per output phase) was built,
            # parity-exact, and LOST integrated 56.3 -> 67.0 ms/pair — the
            # combine's per-tap single-channel reads on the minor dim cost
            # more than the N-lane padding saves (PERF.md round 5).
            y = conv3d_s1_hw_packed(h, kernel.astype(self.dtype),
                                    self.dtype, to_shifted=False)
            return hw_unpack(y)
        x = nn.relu(ConvBN3D(F, 1, dtype=self.dtype, name="convbn")(x, train))
        return Conv3D(1, 1, 3, self.dtype, name="conv")(x)


class MSPSMNet(nn.Module):
    max_disp: int = 192
    in_channels: int = 8
    base_filters: int = 32         # reference hard-codes 32
                                   # (psmnet_3dcnn.py:96-121); narrower
                                   # widths exist for CPU-tractable goldens
    # upscale factor from the volume resolution to full resolution
    # (2 for half-res MS features, 4 for quarter-res)
    upscale: int = 2
    dtype: Any = jnp.float32
    remat: bool = False
    remat_scope: str = "all"       # what remat=True rematerializes:
                                   # "all" (default) every BN'd stage —
                                   # needed at the reference recipe (the
                                   # dres/classifier BN f32 residuals alone
                                   # are 182 MB over HBM with hourglass-only
                                   # remat); "hourglass" remats only the
                                   # hourglass interiors for smaller crops /
                                   # batch. A/B: scripts/perf_psmnet_remat.py
    packed_train: bool = True      # packed dres layouts in train too
                                   # (PackedPhaseBN halo-masked statistics)
    quant_eval: bool = False       # int8 eval of the packed dres convs
    quant_mode: str = "dynamic"    # see ModelConfig.quant_mode
                                   # (1.85x shape) + hourglass entry convs;
                                   # dres0_1's cin=8 entry LOSES (0.84x) and
                                   # stays bf16. scripts/perf_int8_packed.py
    packed_eval_outer: bool = True  # keep the full-res outer graph (hourglass
                                    # outputs, skip adds, classifiers) in
                                    # packed-std layout in EVAL too — same
                                    # graph train uses; full-layout c32
                                    # volumes pay 4x lane-padded HBM traffic
                                    # per touch (A/B: scripts/perf_psmnet.py)

    @nn.compact
    def __call__(self, cv, train: bool = False, stop_at: str = ""):
        """cv: [N, D_in, H_in, W_in, C] ->
        train: (pred1, pred2, pred3) each [N, H_full, W_full]; eval: pred3.

        stop_at: debug/profiling hook — return the named intermediate
        instead of the full network ("dres0", "dres1", "hg1", "hg2", "hg3",
        "classif", meaning cost3 pre-upsample). Used by
        scripts/perf_psmnet_prefix.py to time true prefixes of the eval
        graph; "" (default) runs everything."""
        dt = self.dtype
        F = self.base_filters
        q = self.quant_eval and not train
        qm = self.quant_mode
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
        # remat the full-res dres chain and the classifier heads too — the
        # hourglasses alone leave the dres/classifier BN f32 residuals live
        # through the backward (182 MB over HBM at the reference recipe)
        assert self.remat_scope in ("all", "hourglass"), self.remat_scope
        cbn, clf = ConvBN3D, _Classifier
        if self.remat and self.remat_scope == "all":
            cbn = nn.remat(ConvBN3D, static_argnums=(2, 3, 4))
            clf = nn.remat(_Classifier, static_argnums=(2, 3))
        if use_packed:
            h = nn.relu(cbn(F, 1, dtype=dt, name="dres0_1")(
                x, train, "full", "shift"))
            cost0p = nn.relu(cbn(F, 1, dtype=dt, quant=q, quant_mode=qm, name="dres0_2")(
                h, train, "shift", "std"))
            h = nn.relu(cbn(F, 1, dtype=dt, quant=q, quant_mode=qm, name="dres1_1")(
                cost0p, train, "std", "shift"))
            h = cbn(F, 1, dtype=dt, quant=q, quant_mode=qm, name="dres1_2")(
                h, train, "shift", "std")
            cost0p = h + cost0p
            if stop_at in ("dres0", "dres1"):
                return cost0p
            if train or self.packed_eval_outer:
                # the ENTIRE outer graph stays packed-std: hourglass
                # outputs, skip adds and classifiers never materialize a
                # full-layout 32-channel volume (4x lane padding — the
                # train OOM driver at the reference recipe, and 4x wasted
                # HBM bandwidth per touch in eval).
                cost0, hg1_in, hg1_lin = None, cost0p, "std"
            else:
                cost0 = hw_unpack(cost0p)
                hg1_in, hg1_lin = cost0p, "std"
        else:
            h = nn.relu(cbn(F, 1, dtype=dt, name="dres0_1")(
                x, train, "full", "full"))
            cost0 = nn.relu(cbn(F, 1, dtype=dt, quant=q, quant_mode=qm, name="dres0_2")(
                h, train, "full", "full"))
            h = nn.relu(cbn(F, 1, dtype=dt, quant=q, quant_mode=qm, name="dres1_1")(
                cost0, train, "full", "full"))
            # quant=q here too so both branches request the same coverage
            # (in the full layout, stride-1 convs are quant no-ops — see
            # the ConvBN3D.quant gate note — so this only matters if the
            # gate ever widens).
            h = cbn(F, 1, dtype=dt, quant=q, quant_mode=qm, name="dres1_2")(
                h, train, "full", "full")
            cost0 = h + cost0
            if stop_at in ("dres0", "dres1"):
                return cost0
            hg1_in, hg1_lin = cost0, "full"
        hg = lambda name: Hourglass(F, dtype=dt, quant=q, quant_mode=qm,
                                    remat_stages=self.remat, name=name)
        packed_outer = use_packed and (train or self.packed_eval_outer)
        lio = "std" if packed_outer else "full"
        skip = cost0p if packed_outer else cost0
        out1, pre1, post1 = hg("dres2")(hg1_in, None, None, train,
                                        hg1_lin, lio)
        out1 = out1 + skip
        if stop_at == "hg1":
            return out1
        out2, _, post2 = hg("dres3")(out1, pre1, post1, train, lio, lio)
        out2 = out2 + skip
        if stop_at == "hg2":
            return out2
        out3, _, _ = hg("dres4")(out2, pre1, post2, train, lio, lio)
        out3 = out3 + skip
        if stop_at == "hg3":
            return out3

        cost1 = clf(features=F, dtype=dt, name="classif1")(out1, train, lio)
        cost2 = clf(features=F, dtype=dt, name="classif2")(out2, train, lio) + cost1
        cost3 = clf(features=F, dtype=dt, name="classif3")(out3, train, lio) + cost2
        if stop_at == "classif":
            return cost3

        def regress(c):
            # [N, D_in, H_in, W_in, 1] -> upsample -> [N, D, H, W] -> disparity
            up = resize_trilinear_align_corners(
                c.astype(jnp.float32), full, axes=(1, 2, 3))
            return soft_argmin(jnp.squeeze(up, -1), self.max_disp)

        pred3 = regress(cost3)
        if train:
            return regress(cost1), regress(cost2), pred3
        return pred3
