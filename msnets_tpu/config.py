"""Unified typed configuration for the MS-Nets TPU framework.

Replaces the reference's three config tiers (SURVEY.md §5.6):
  1. argparse runtime flags      (reference: main_msnet.py:803-838)
  2. the hard-coded feature-stage hyper-parameter dict
     ``get_default_args_dict``   (reference: src/dataloader/cbmv_generator.py:434-462)
  3. the bash experiment driver  (reference: do_main_msnet.sh)

Everything is a frozen dataclass so configs are hashable and can be closed
over by jitted functions without retracing surprises.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

# float32(RAND_MAX): the sentinel the reference C++ kernels use to mark
# cost-volume entries that were never computed (matchers.cpp:65,251,377,462).
# 2147483647 rounds to 2147483648.0 in float32.
INVALID = 2147483648.0
INVALID_COST = INVALID  # alias


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    """Matching-space feature-stage hyper-parameters.

    Defaults mirror the reference ``get_default_args_dict``
    (cbmv_generator.py:434-462).
    """
    censw: int = 11          # census window
    nccw: int = 3            # NCC window
    sadw: int = 5            # ZSAD window
    sobelw: int = 5          # SAD-of-Sobel window
    cens_sigma: float = 128.0
    ncc_sigma: float = 0.02
    sad_sigma: float = 20000.0
    # NOTE: the reference accepts sobel_sigma but actually uses sad_sigma for
    # the sobel AML channel (cbmv_generator.py:224-225,298). We keep the field
    # for API parity; feature assembly uses sad_sigma for sobel, as upstream.
    sobel_sigma: float = 20000.0
    num_channels: int = 8    # "cbmv_F": 8 (left-only) or 16 (left+right)
    board_h: int = 12        # vertical margin cropped off train samples
    ds_scale: int = 2        # features computed at 1/ds_scale resolution
    sf_frames_type: str = "frames_finalpass"
    features_mode: str = "ms"  # "ms" = matching-space features (the paper);
                               # "raw" = 2-channel raw-intensity concat
                               # volume [L(x), R(x-d)] — the no-matching
                               # ablation baseline (the paper's comparison
                               # point: GCNet-style intensity volumes do not
                               # generalize cross-domain, README.md:92-101)

    @property
    def left_only(self) -> bool:
        return self.num_channels == 8

    @property
    def feature_channels(self) -> int:
        """Channels the feature stage actually emits (drives the model's
        in_channels and the feature-volume shapes)."""
        return 2 if self.features_mode == "raw" else self.num_channels


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """3-D cost-volume regularizer configuration."""
    name: str = "MS-GCNet"       # "MS-GCNet" | "MS-PSMNet"
    max_disp: int = 192
    in_channels: int = 8
    base_filters: int = 32       # GCNet "F" (gcnet_3dcnn.py:68)
    # True when the input cost volume is 1/4 resolution (ds_scale == 4);
    # the final deconv then upsamples x4 instead of x2 (gcnet_3dcnn.py:88-92).
    quarter_input: bool = False
    # encoder padding granularity: eval inputs are padded up to a multiple of
    # this (reference self.ds = 32, main_msnet.py:59).
    encoder_ds: int = 32
    # compute dtype for convolutions ("bfloat16" recommended on TPU,
    # "float32" for strict parity tests). Params/BN stats stay float32.
    compute_dtype: str = "bfloat16"
    # lowering for the GCNet mid deconvs (deconvbn1-3): "dense" (XLA
    # lhs_dilation), "conv_shuffle" (sparse-FLOP packed conv + full
    # shuffle), or "ps_shuffle" (packed conv + PARTIAL shuffle: pz/ph move
    # as major axes, pw stays channel-folded through a free reshape — kills
    # the lane-crossing interleave that made conv_shuffle lose eval).
    # A/B numbers: PERF.md "Mid-deconv lowering" section.
    mid_deconv_mode: str = "dense"
    mid_deconv_mode_train: str = "conv_shuffle"
    # int8 eval of the compute-bound convs: dynamic per-SAMPLE activation +
    # per-channel weight symmetric quantization onto the MXU's 2x s8 rate
    # (scripts/perf_int8_conv.py / perf_quant_eval.py). Train is unaffected.
    # Coverage is shape-gated (see ConvBN3D.quant): packed stride-1
    # lowerings plus stride-2 convs above the >=1M-voxel s2d gate; smaller
    # memory-bound convs (gcnet blocks 2-4, hourglass inner convs at bench
    # shapes) deliberately stay bf16.
    quant_eval: bool = False
    # activation-scale regime for quant_eval:
    #   "dynamic" — per-SAMPLE scale from a max-abs pass over each quantized
    #               conv's input (no calibration needed, but the extra HBM
    #               pass made int8 LOSE to bf16 at bench shapes, PERF.md);
    #   "static"  — fixed per-layer scalar scales read from the quant_stats
    #               collection (recorded by one "calib" forward); the int8
    #               cast fuses into the producer, no max pass;
    #   "calib"   — bf16 compute, records each quantized conv's input absmax
    #               into quant_stats (mutable=["quant_stats"]).
    quant_mode: str = "dynamic"
    # which convs quant_eval covers: "all" (stem conv2 + encoder block entry
    # convs) or "stem" (conv2 only, the biggest int8 winner at 1.85x —
    # restricts the s32/dequant HBM overhead to the one conv where the MXU
    # rate win dominates; A/B: scripts/perf_quant_scope.py)
    quant_scope: str = "all"
    # MS-PSMNet only: keep the full-res outer graph (hourglass outputs,
    # skip adds, classifiers) in packed-std layout in eval too (train
    # always does) — full-layout c32 volumes pay 4x lane-padded HBM
    # traffic per touch on v5e. A/B: scripts/perf_psmnet.py.
    packed_eval_outer: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer settings (reference main_msnet.py argparse + driver)."""
    crop_height: int = 256
    crop_width: int = 512
    batch_size: int = 2
    lr: float = 1e-3
    # epoch after which lr is multiplied by 0.1 (main_msnet.py:223-231)
    lr_decay_epoch: int = 200
    lr_decay_factor: float = 0.1
    epochs: int = 10
    start_epoch: int = 0
    seed: int = 1234
    num_workers: int = 4
    log_summary_step: int = 40
    # checkpoint cadence: every epoch for Scene Flow, every N for KITTI
    # fine-tuning (main_msnet.py:518-526)
    kitti_ckpt_every: int = 25
    # loss: GCNet KITTI = 0.4*smoothL1 + 0.6*MyLoss2(thresh=3, alpha=2)
    loss2_thresh: float = 3.0
    loss2_alpha: float = 2.0
    checkpoint_dir: str = "./checkpoints"
    train_logdir: str = "./logs"
    resume: str = ""
    # gradient rematerialization of BN'd stages to trade FLOPs for HBM.
    # With the packed train layouts the reference config (crop 256x512,
    # D=192, batch 2) peaks at 10.9 GiB without remat on a 16 GiB v5e and
    # steps 16% faster (199 vs 236 ms); turn remat on for larger crops /
    # batches (scripts/train_step_memstats.py prints XLA's HBM analysis
    # without executing)
    remat: bool = False
    # MS-PSMNet remat scope: "all" remats every BN'd stage (required at the
    # reference recipe); "hourglass" remats only the hourglass interiors —
    # cheaper recompute when the dres/classifier residuals fit HBM
    # (smaller crops/batch; scripts/perf_psmnet_remat.py measures both)
    remat_scope: str = "all"
    # micro-batching: split each batch into N sequential micro-steps,
    # accumulating gradients (BatchNorm stats thread through sequentially).
    # Lets train-crop batch 2 fit one chip's HBM; batch_size % grad_accum == 0
    grad_accum: int = 1
    # multi-host input sharding: each host streams entries
    # perm[host_id::num_hosts] of the epoch permutation (the corrected
    # my_worker_init_fn, SURVEY.md §2.2 / dataset.py:349-357). With
    # jax.distributed these default from process_count()/process_index().
    num_hosts: int = 1
    host_id: int = 0
    # async checkpointing: epoch saves snapshot on-device and write on a
    # background thread (engine/checkpoint.py:AsyncCheckpointer), so the
    # next epoch starts without waiting on the HBM->host fetch + disk write
    async_ckpt: bool = True
    # mid-epoch (step-granular) async checkpoints every N steps (0 = off):
    # model_step_%08d.msgpack with {epoch, iteration} meta; run_train
    # resumes INSIDE the epoch, replaying exactly the remaining batches
    # (the reference's recovery granularity is one epoch, §5.3)
    ckpt_every_steps: int = 0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset selection & paths (reference dataset flags + lists)."""
    data_path: str = ""
    training_list: str = "lists/sceneflow_train.list"
    test_list: str = "lists/sceneflow_test_small.list"
    # mutually exclusive dataset selectors, as in the reference CLI
    kitti2012: bool = False
    kitti2015: bool = False
    eth3d: bool = False
    middlebury: bool = False

    @property
    def dataset(self) -> str:
        if self.kitti2012:
            return "kitti2012"
        if self.kitti2015:
            return "kitti2015"
        if self.eth3d:
            return "eth3d"
        if self.middlebury:
            return "middlebury"
        return "sceneflow"

    @property
    def bad_threshold(self) -> float:
        """Per-dataset bad-τ threshold (main_msnet.py:598-605)."""
        if self.kitti2012 or self.kitti2015:
            return 3.0
        return 1.0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD execution.

    Axes (SURVEY.md §5.7):
      data    - batch (data parallel; gradient psum over ICI)
      spatial - H axis of the cost volume (halo exchange for 3-D convs)
      disp    - disparity axis (soft-argmin becomes a cross-chip reduction)
    """
    data: int = 1
    spatial: int = 1
    disp: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.spatial * self.disp


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    result_dir: str = "./results"
    threshold: float = 3.0       # overridden per dataset at eval time
    save_pfm: bool = True
    save_color: bool = True


@dataclasses.dataclass(frozen=True)
class Config:
    matching: MatchingConfig = dataclasses.field(default_factory=MatchingConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mode: str = "train"          # train | loop-train | test | val-30 | cross-val | eval-badx

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        return Config(
            matching=MatchingConfig(**d.get("matching", {})),
            model=ModelConfig(**d.get("model", {})),
            train=TrainConfig(**d.get("train", {})),
            data=DataConfig(**d.get("data", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
            eval=EvalConfig(**d.get("eval", {})),
            mode=d.get("mode", "train"),
        )


def replace(cfg, **kw):
    """dataclasses.replace passthrough for terseness."""
    return dataclasses.replace(cfg, **kw)
