"""Command-line interface.

Flag-compatible with the reference trainer CLI (reference
main_msnet.py:803-838) and subsuming its bash driver's task types
(do_main_msnet.sh:82-87): train, loop-train, test, val-30, cross-val,
eval-badx. ``loop-train`` keeps the reference's epoch-granular
restart-resume capability (each epoch resumes the previous epoch's
checkpoint) without needing a process restart — but since checkpoints are
written every epoch, an external bash loop works identically.

Extensions beyond the reference: --mesh data,spatial,disp for SPMD layouts,
--compute_dtype {bfloat16,float32}, --num_hosts/--host_id for multi-host
input sharding.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .config import (Config, DataConfig, EvalConfig, MatchingConfig,
                     MeshConfig, ModelConfig, TrainConfig)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MS-Nets TPU framework")
    p.add_argument("--crop_height", type=int, default=256)
    p.add_argument("--crop_width", type=int, default=512)
    p.add_argument("--max_disp", type=int, default=192)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--batchSize", type=int, default=1)
    p.add_argument("--ckpt_every_steps", type=int, default=0,
                   help="mid-epoch async checkpoint every N steps (0 off); "
                        "resuming such a checkpoint continues INSIDE the "
                        "epoch at the exact next batch")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batch count per step (gradient accumulation)."
                        " BN batch statistics are computed per micro-batch"
                        " (sequentially threaded = consecutive reference"
                        " steps' semantics), not over the full batch."
                        " NOTE: MS-PSMNet with batch >= 2 and no explicit"
                        " --remat/--grad_accum defaults to no-remat +"
                        " micro-batch-1 accumulation (grad_accum=batch;"
                        " 406 vs 659 ms/step at the reference recipe; a log"
                        " line records when this engages)")
    p.add_argument("--log_summary_step", type=int, default=200)
    p.add_argument("--nEpochs", type=int, default=400)
    p.add_argument("--startEpoch", type=int, default=0)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--kitti2012", type=int, default=0)
    p.add_argument("--kitti2015", type=int, default=0)
    p.add_argument("--eth3d", type=int, default=0)
    p.add_argument("--middlebury", type=int, default=0)
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--training_list", type=str,
                   default="lists/sceneflow_train.list")
    p.add_argument("--test_list", type=str,
                   default="lists/sceneflow_test_select.list")
    p.add_argument("--checkpoint_dir", type=str, default="./checkpoints")
    p.add_argument("--train_logdir", type=str, default="./logs/tmp")
    p.add_argument("--model_name", type=str, default="MS-GCNet")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "loop-train", "test", "val-30",
                            "cross-val", "eval-badx"])
    p.add_argument("--resultDir", type=str, default="./results")
    p.add_argument("--threshold", type=float, default=3.0)
    p.add_argument("--sf_frames", type=str, default="frames_finalpass")
    p.add_argument("--cbmv_F", type=int, default=8, choices=[8, 16],
                   help="8 = left-only features, 16 = left+right")
    # TPU-native extensions
    p.add_argument("--mesh", type=str, default="",
                   help="e.g. '2,2,2' for (data, spatial, disp)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--num_hosts", type=int, default=1,
                   help="input-pipeline shard count (strided, full-coverage)")
    p.add_argument("--host_id", type=int, default=0)
    p.add_argument("--coordinator", type=str, default="",
                   help="jax.distributed coordinator address host:port; "
                        "when set, num_hosts/host_id default from "
                        "process_count()/process_index()")
    p.add_argument("--remat", dest="remat", action="store_true",
                   help="rematerialize BN'd stages (needed above the "
                        "reference crop/batch; see TrainConfig.remat)")
    p.add_argument("--no_remat", dest="remat", action="store_false")
    p.add_argument("--remat_scope", type=str, default="all",
                   choices=["all", "hourglass"],
                   help="MS-PSMNet remat scope: 'all' (reference recipe) or "
                        "'hourglass' (interiors only; cheaper recompute when "
                        "the dres/classifier residuals fit HBM)")
    p.add_argument("--quant_eval", type=int, default=0,
                   help="int8 eval of the compute-bound convs (2x MXU rate; "
                        "~0.1 px disparity delta, scripts/perf_quant_eval.py)."
                        " Coverage is shape-gated: packed stride-1 lowerings"
                        " and stride-2 convs above conv3d_ndhwc's >=1M-voxel"
                        " even-dims gate; small/memory-bound convs stay bf16")
    p.add_argument("--quant_scope", type=str, default="all",
                   choices=["all", "stem"],
                   help="which convs --quant_eval covers (MS-GCNet): 'all' "
                        "= stem conv2 + encoder block entries; 'stem' = "
                        "conv2 only. Both measured slower than bf16 at "
                        "bench shapes (PERF.md) — int8 is opt-in")
    p.add_argument("--quant_mode", type=str, default="dynamic",
                   choices=["dynamic", "static"],
                   help="activation-scale regime for --quant_eval: 'dynamic'"
                        " = per-sample max-abs pass; 'static' = fixed"
                        " per-layer scales from a one-shot calibration"
                        " forward on the first frame (no max pass; ~3%% "
                        "faster, out-of-range values saturate at +-127)")
    p.add_argument("--features", type=str, default="ms",
                   choices=["ms", "raw"],
                   help="feature stage: 'ms' = matching-space volume (the "
                        "paper); 'raw' = 2-channel raw-intensity concat "
                        "volume [L(x), R(x-d)] — the no-matching ablation "
                        "baseline for cross-domain experiments")
    # None -> model-dependent default in args_to_config (MS-PSMNet needs
    # remat at the reference recipe: 24.3G > 15.75G HBM without it)
    p.set_defaults(remat=None)
    return p


def args_to_config(a) -> Config:
    seed = a.seed if a.seed > 0 else int(time.time()) % (2 ** 31)
    remat = a.remat if a.remat is not None else (
        a.model_name == "MS-PSMNet" or TrainConfig.remat)
    grad_accum = a.grad_accum
    if (a.model_name == "MS-PSMNet" and a.remat is None
            and a.grad_accum == 1 and a.batchSize >= 2):
        # MS-PSMNet reference-recipe default: NO remat, the batch as
        # batchSize sequential micro-batches of ONE — activations shrink to
        # a single pair's (10.6 GiB AOT, perf_psmnet_remat.py scope=accum)
        # and no recompute is paid: 406 vs 659 ms/step measured at the
        # reference recipe (PERF.md round 5). micro-batch 1 is the ONLY
        # no-remat size that fits: micro-batch 2 (the round-4 default's
        # grad_accum=2 at batchSize 4) needs ~20 GiB and OOMs. BN stats
        # thread sequentially = consecutive reference steps' semantics.
        # Explicit --remat/--no_remat or --grad_accum overrides.
        remat, grad_accum = False, a.batchSize
        print(f"[**] MS-PSMNet default engaged: no-remat + micro-batch-1 "
              f"accumulation (grad_accum={a.batchSize}; BN stats per "
              f"sample, a deviation from the reference's full-batch BN; "
              f"override with --remat or --grad_accum 1)")
    matching = MatchingConfig(sf_frames_type=a.sf_frames,
                              num_channels=a.cbmv_F,
                              features_mode=getattr(a, "features", "ms"))
    return Config(
        matching=matching,
        model=ModelConfig(name=a.model_name, max_disp=a.max_disp,
                          in_channels=matching.feature_channels,
                          compute_dtype=a.compute_dtype,
                          quant_eval=bool(a.quant_eval),
                          quant_mode=a.quant_mode,
                          quant_scope=a.quant_scope),
        train=TrainConfig(crop_height=a.crop_height, crop_width=a.crop_width,
                          batch_size=a.batchSize, lr=a.lr,
                          epochs=a.nEpochs, start_epoch=a.startEpoch,
                          seed=seed, num_workers=a.threads,
                          log_summary_step=a.log_summary_step,
                          checkpoint_dir=a.checkpoint_dir,
                          train_logdir=a.train_logdir, resume=a.resume,
                          remat=remat, remat_scope=a.remat_scope,
                          grad_accum=grad_accum,
                          num_hosts=a.num_hosts, host_id=a.host_id,
                          ckpt_every_steps=a.ckpt_every_steps),
        data=DataConfig(data_path=a.data_path, training_list=a.training_list,
                        test_list=a.test_list,
                        kitti2012=bool(a.kitti2012),
                        kitti2015=bool(a.kitti2015),
                        eth3d=bool(a.eth3d), middlebury=bool(a.middlebury)),
        eval=EvalConfig(result_dir=a.resultDir, threshold=a.threshold),
        mode=a.mode,
    )


def make_mesh_from_arg(mesh_arg: str):
    if not mesh_arg:
        return None
    from .parallel import mesh as pm
    shape = tuple(int(x) for x in mesh_arg.split(","))
    assert len(shape) == 3, "--mesh wants data,spatial,disp"
    import jax
    return pm.make_mesh(shape=shape, devices=jax.devices()[:int(np.prod(shape))])


def run_train(cfg: Config, mesh=None, log=print):
    from .data.pipeline import TrainPipeline
    from .engine import Trainer
    from .engine.checkpoint import ckpt_path
    from .utils import summary as S

    tr = Trainer(cfg, mesh=mesh)
    state = tr.init_state(tr.feats_shape_for(cfg.train.batch_size),
                          seed=cfg.train.seed)
    resume_epoch, resume_iter = 0, 0
    if cfg.train.resume and os.path.isfile(cfg.train.resume):
        log(f"[***] resuming from {cfg.train.resume}")
        state = tr.resume(state, cfg.train.resume)
        meta_path = cfg.train.resume + ".json"
        if os.path.isfile(meta_path):
            import json
            meta = json.load(open(meta_path))
            if "iteration" in meta:     # step-granular checkpoint: resume
                resume_epoch = int(meta["epoch"])      # INSIDE that epoch
                resume_iter = int(meta["iteration"])
                log(f"[***] mid-epoch resume: epoch {resume_epoch} "
                    f"batch {resume_iter}")

    pipe = TrainPipeline(cfg.data, cfg.matching, cfg.train.crop_height,
                         cfg.train.crop_width, cfg.model.max_disp,
                         cfg.train.batch_size, seed=cfg.train.seed,
                         num_threads=cfg.train.num_workers,
                         num_hosts=cfg.train.num_hosts,
                         host_id=cfg.train.host_id)
    # exact per-epoch step counts: steps_per_epoch() is only an UPPER bound
    # under mixed-geometry bucketing (partial buckets drop per geometry), so
    # gstep derived from it could double-count across epochs (advisor r4).
    # batch_schedule is a pure function of (seed, epoch, entry widths) and
    # widths cache across epochs, so these are header-sniff-cheap.
    _sched_len: dict = {}

    def epoch_len(e: int) -> int:
        if e not in _sched_len:
            _sched_len[e] = len(pipe.batch_schedule(e))
        return _sched_len[e]

    def global_step(epoch: int, iteration: int) -> int:
        return sum(epoch_len(e) for e in range(1, epoch)) + iteration

    writer = None
    if cfg.train.train_logdir:
        try:
            writer = S.TrainSummaryWriter(cfg.train.train_logdir)
        except Exception as e:  # tensorboardX optional
            log(f"[warn] no summary writer: {e}")
    run_log = {"loss": 0.0, "epe": 0.0, "n": 0}

    def log_fn(epoch, iteration, metrics, sec_per_step, state, disp, batch):
        gstep = global_step(epoch, iteration)
        log(S.console_line(epoch, iteration, epoch_len(epoch), gstep, metrics,
                           sec_per_step, S.process_mem_mb()))
        sys.stdout.flush()
        run_log["loss"] += metrics["loss"]
        run_log["epe"] += metrics["epe"]
        run_log["n"] += 1
        ls = cfg.train.log_summary_step
        if writer is not None and iteration % ls == ls - 1:
            n = max(run_log["n"], 1)
            writer.scalars(gstep, run_log["loss"] / n, run_log["epe"] / n)
            # per-matcher argmin feature-quality probe (main_msnet.py:443-458)
            probe = tr.matcher_probe_fn(
                batch["board_h"], batch["board_w_left"],
                batch["board_w_right"])(batch["iml"], batch["imr"])
            # KITTI runs colorize disparities with the KT15 false-color map
            # instead of jet (main_msnet.py:246-320 via dispColor.py:42-57)
            writer.images(gstep, batch["left_rgb"], batch["right_rgb"],
                          np.asarray(disp), batch["disp"],
                          matcher_argmin=S.matcher_argmin_from_probe(
                              np.asarray(probe)),
                          kt15_color=bool(cfg.data.kitti2012
                                          or cfg.data.kitti2015))
            run_log.update(loss=0.0, epe=0.0, n=0)

    avg = {}
    e0, ne = cfg.train.start_epoch, cfg.train.epochs
    first, last = 1 + e0, e0 + ne       # the configured epoch window
    if resume_iter and first <= resume_epoch <= last:
        first = resume_epoch            # re-enter the interrupted epoch;
                                        # the END bound must not move
    try:
        for epoch in range(first, last + 1):
            log(f"[**] training epoch {epoch}/{last}")
            si = resume_iter if epoch == resume_epoch else 0
            state, avg = tr.train_epoch(state, pipe, epoch, log_fn=log_fn,
                                        start_iteration=si)
            log("===> Epoch {} Complete: Avg. Loss: {:.4f}, Avg. EPE: {:.4f}, "
                "Accu3: {:.4f}".format(epoch, avg["loss"], avg["epe"],
                                       avg["accu3"]))
            tr.maybe_save(state, epoch, avg)
        tr.maybe_save(state, last, avg, final=True)
    finally:
        # drain async writes even on a crash — the newest model_step_*
        # files are exactly what crash recovery resumes from
        try:
            tr.finish_checkpoints()
        except Exception as e:          # never mask the original error
            log(f"[warn] checkpoint drain failed: {e}")
    if writer is not None:
        writer.close()
    return state


def run_loop_train(cfg: Config, mesh=None, log=print):
    """Epoch-granular restart semantics (do_main_msnet.sh:143-192): each
    epoch resumes the previous epoch's checkpoint file."""
    from dataclasses import replace
    from .engine.checkpoint import ckpt_path
    e0, ne = cfg.train.start_epoch, cfg.train.epochs
    resume = cfg.train.resume
    for epoch in range(e0, e0 + ne):
        c = replace(cfg, train=replace(cfg.train, start_epoch=epoch,
                                       epochs=1, resume=resume))
        run_train(c, mesh=mesh, log=log)
        resume = ckpt_path(cfg.train.checkpoint_dir, cfg.model.name, epoch + 1)


def run_test(cfg: Config, mesh=None, log=print):
    from .engine import Evaluator, Trainer
    from .engine.checkpoint import load_checkpoint
    tr = Trainer(cfg, mesh=None)
    state = tr.init_state(tr.feats_shape_for(1), seed=0)
    assert cfg.train.resume, "test mode needs --resume checkpoint"
    state = tr.resume(state, cfg.train.resume)
    ev = Evaluator(cfg, {"params": state.params,
                         "batch_stats": state.batch_stats}, mesh=mesh)
    return ev.run(log=log)


def main(argv=None):
    a = build_parser().parse_args(argv)
    if a.coordinator:
        from .parallel.mesh import init_distributed
        nh, hid = init_distributed(
            coordinator_address=a.coordinator,
            num_processes=a.num_hosts if a.num_hosts > 1 else None,
            process_id=a.host_id)
        a.num_hosts, a.host_id = nh, hid
    cfg = args_to_config(a)
    mesh = make_mesh_from_arg(a.mesh)
    print(f"[***] mode={cfg.mode} model={cfg.model.name} "
          f"dataset={cfg.data.dataset}")
    if cfg.mode == "train":
        run_train(cfg, mesh)
    elif cfg.mode == "loop-train":
        run_loop_train(cfg, mesh)
    elif cfg.mode in ("test", "val-30", "cross-val"):
        run_test(cfg, mesh)
    elif cfg.mode == "eval-badx":
        from .engine import eval_bad_x
        eval_bad_x(cfg)
    print(f"[***] {cfg.mode} finished")


if __name__ == "__main__":
    main()
