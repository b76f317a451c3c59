"""MS-GCNet: GCNet-style encoder-decoder 3-D cost-volume regularizer.

Architecture parity with the reference GCNet_CostVolumeAggre
(src/models/gcnet_3dcnn.py:57-141):

    stem:    2x (conv3d+BN+ReLU)          8 -> 32 -> 32
    encoder: 4x Conv3DBlock stride 2      32 -> 64 -> 64 -> 64 -> 128
    decoder: 4x (deconv3d+BN) with additive skips + ReLU
             128 -> 64 (+res29), 64 -> 64 (+res26), 64 -> 64 (+res23),
             64 -> 32 (+res20)
    head:    ConvTranspose3d(32 -> 1, stride 2 [or 4 for quarter-res input],
             no BN/ReLU) restoring full D, H, W
    softmax over D + soft-argmin disparity expectation

Native layout [N, D, H, W, C]; returns disparity [N, H, W]. The input is the
half-resolution 8-channel MS feature volume; the final deconv doubles D/H/W
to full resolution, so D_in = max_disp // 2.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import (Conv3DBlock, ConvBN3D, Deconv3D, DeconvBN3D,
                     SubpixelSoftArgminHead, d_split_pack, hw_unpack, soft_argmin)


class MSGCNet(nn.Module):
    max_disp: int = 192
    in_channels: int = 8
    num_filters: int = 32          # reference self.F (gcnet_3dcnn.py:68)
    quarter_input: bool = False    # input volume at 1/4 res -> final x4 deconv
    dtype: Any = jnp.float32
    remat: bool = False
    packed_train: bool = True      # run the packed layouts in train too
                                   # (PackedPhaseBN halo-masked statistics)
    mid_deconv_mode: str = "dense"  # eval lowering for deconvbn1-3 ("dense"
                                    # | "conv_shuffle"); A/B: perf_deconv3.py
    mid_deconv_mode_train: str = "conv_shuffle"  # train-branch lowering
                                    # (its VJP wins: 186.5 vs 194 ms/step)
    quant_eval: bool = False        # int8 eval of the stem/encoder convs
                                    # (s8xs8->s32 MXU, 2.6x on stem shapes;
                                    # scripts/perf_quant_eval.py for the
                                    # accuracy/throughput A/B)
    quant_mode: str = "dynamic"     # "dynamic" | "static" | "calib"
                                    # (see ModelConfig.quant_mode; static
                                    # needs one calib forward first)
    quant_scope: str = "all"        # which convs quant_eval covers: "all"
                                    # (conv2 + block entries, the round-1/2
                                    # coverage) or "stem" (conv2 only — the
                                    # one conv where int8 wins big, 1.85x;
                                    # A/B: scripts/perf_quant_scope.py)

    @nn.compact
    def __call__(self, cv, train: bool = False, stop_at: str = ""):
        """cv: [N, D_in, H_in, W_in, C] -> disparity [N, 2*H_in, 2*W_in].

        stop_at: debug/profiling hook — return the named intermediate
        instead of running the full network ("stem", "block1", "block2",
        "block3", "block4", "deconv1", "deconv2", "deconv3"). Used by
        scripts/perf_model_prefix.py to time true prefixes of the eval
        graph; "" (default) runs everything."""
        F = self.num_filters
        dt = self.dtype
        assert self.quant_scope in ("all", "stem"), self.quant_scope
        q = self.quant_eval and not train
        qb = q and self.quant_scope == "all"   # block entry convs
        qm = self.quant_mode
        x = cv.astype(dt)

        # remat every BN'd stage: BatchNorm keeps float32 intermediates whose
        # stored residuals at train shapes (1.6 GB per early layer) overflow
        # HBM in the backward pass without rematerialization
        block, convbn, deconvbn = Conv3DBlock, ConvBN3D, DeconvBN3D
        if self.remat:
            block = nn.remat(Conv3DBlock, static_argnums=(2, 3))
            convbn = nn.remat(ConvBN3D, static_argnums=(2, 3, 4))
            deconvbn = nn.remat(DeconvBN3D, static_argnums=(2, 3))

        # Eval runs the full-resolution stem in the packed H,W space-to-depth
        # layout (layers.py:conv3d_s1_hw_packed): cout=32 stride-1 convs only
        # reach 25% MXU N-dim utilization unpacked (6.7 ms each at bench
        # shapes); packing 4 output phases into channels gives N=128 at 1.78x
        # padded FLOPs, and block_3d_1's stride-2 conv consumes the packed
        # tensor directly. Train runs the same layouts with PackedPhaseBN:
        # halo-masked statistics equal the full-layout BatchNorm's exactly.
        N_, D_, H_, W_, _ = x.shape
        use_packed = ((not train or self.packed_train)
                      and H_ % 2 == 0 and W_ % 2 == 0
                      and D_ % 2 == 0 and H_ >= 4 and W_ >= 4)
        res_l20p = None
        if use_packed:
            # conv1 enters the packed world directly from the full-res volume
            # (stride-2 expanded kernel — an explicit hw_pack transpose of
            # the 8-channel input costs 4.9 ms on v5e)
            # conv1 stays bf16: its 4x4 cin=8 expanded kernel LOSES in int8
            # (0.84x, scripts/perf_int8_packed.py — the tiny contraction is
            # not MXU-rate-bound); conv2's [2,2,128,128] taps win 1.85x.
            x1 = nn.relu(convbn(F, 1, dtype=dt, name="conv3dbn_1")(
                x, train, "full", "shift"))
            x2 = nn.relu(convbn(F, 1, dtype=dt, quant=q, quant_mode=qm,
                                 name="conv3dbn_2")(
                x1, train, "shift", "std"))
            res_l20, res_l20p = None, x2      # stays packed; see decoder tail
            if self.quarter_input:            # x4 tail can't consume packed
                res_l20, res_l20p = hw_unpack(x2), None
            if stop_at == "stem":
                return x2
            x = block(2 * F, 2, dtype=dt, quant=qb, quant_mode=qm, name="block_3d_1")(x2, train, "std")
        else:
            x = nn.relu(convbn(F, 1, dtype=dt, name="conv3dbn_1")(
                x, train, "full", "full"))
            x = nn.relu(convbn(F, 1, dtype=dt, name="conv3dbn_2")(
                x, train, "full", "full"))
            res_l20 = x
            if stop_at == "stem":
                return x
            x = block(2 * F, 2, dtype=dt, quant=qb, quant_mode=qm, name="block_3d_1")(x, train, "full")
        if stop_at == "block1":
            return x
        res_l23 = x
        x = block(2 * F, 2, dtype=dt, quant=qb, quant_mode=qm, name="block_3d_2")(x, train, "full")
        if stop_at == "block2":
            return x
        res_l26 = x
        x = block(2 * F, 2, dtype=dt, quant=qb, quant_mode=qm, name="block_3d_3")(x, train, "full")
        if stop_at == "block3":
            return x
        res_l29 = x
        x = block(4 * F, 2, dtype=dt, quant=qb, quant_mode=qm, name="block_3d_4")(x, train, "full")
        if stop_at == "block4":
            return x

        md, mdt = self.mid_deconv_mode, self.mid_deconv_mode_train
        x = nn.relu(deconvbn(2 * F, dtype=dt, mode=md, train_mode=mdt,
                             name="deconvbn1")(x, train, "full") + res_l29)
        if stop_at == "deconv1":
            return x
        x = nn.relu(deconvbn(2 * F, dtype=dt, mode=md, train_mode=mdt,
                             name="deconvbn2")(x, train, "full") + res_l26)
        if stop_at == "deconv2":
            return x
        x = nn.relu(deconvbn(2 * F, dtype=dt, mode=md, train_mode=mdt,
                             name="deconvbn3")(x, train, "full") + res_l23)
        if stop_at == "deconv3":
            return x

        # reference deconv5 is a bare nn.ConvTranspose3d (default bias=True)
        # + softmax + soft-argmin; fused into the subpixel head (layers.py)
        stride = 4 if self.quarter_input else 2
        if res_l20p is not None and stride == 2:
            # deconvbn4's output never leaves a phase-packed layout (the
            # depth-to-space interleave alone measured 6.5 ms at bench
            # shapes). Eval goes further: the deconv emits two depth-parity
            # SLABS so the conv2-layout skip aligns via a free reshape view
            # (no d_split_pack transpose, 1.53 ms) with the adds fused into
            # the deconv's conv epilogues, and the head reads the slab pair
            # directly. Train keeps the packed-3d path: PackedPhaseBN needs
            # one tensor for its phase-folded statistics.
            N2, D2 = res_l20p.shape[0], res_l20p.shape[1] // 2
            wb_even = res_l20p.shape[3] % 2 == 0
            if not train and wb_even:
                skv = res_l20p.reshape(N2, D2, 2, *res_l20p.shape[2:])
                s0, s1 = deconvbn(F, dtype=dt, name="deconvbn4")(
                    x, train, "pzslab", (skv[:, :, 0], skv[:, :, 1]))
                assert D2 * 4 == self.max_disp
                return SubpixelSoftArgminHead(stride=2, dtype=dt,
                                              name="deconv5")(
                    (nn.relu(s0), nn.relu(s1)), "pzslab")
            y4 = deconvbn(F, dtype=dt, name="deconvbn4")(x, train, "packed3d")
            x = nn.relu(y4 + d_split_pack(res_l20p))
            assert x.shape[1] * 4 == self.max_disp, \
                f"{x.shape[1] * 4} != {self.max_disp}"
            return SubpixelSoftArgminHead(stride=2, dtype=dt,
                                          name="deconv5")(x, True)
        x = nn.relu(deconvbn(F, dtype=dt, name="deconvbn4")(
            x, train, "full") + res_l20)
        assert x.shape[1] * stride == self.max_disp, \
            f"{x.shape[1] * stride} != {self.max_disp}"
        return SubpixelSoftArgminHead(stride=stride, dtype=dt,
                                      name="deconv5")(x)
