"""Evaluator: test / val-30 / cross-val / eval-badx task modes.

Parity with the reference test loop (reference main_msnet.py:533-648) and
offline re-scoring (main_msnet.py:655-706):
  * per-dataset bad-tau threshold: ETH3D 1.0, Middlebury 1.0, KITTI 3.0,
    Scene Flow 1.0 (main_msnet.py:598-605)
  * un-padding: disp[crop_h - h : crop_h, 0 : w] (main_msnet.py:585-589)
  * result layout: resultDir/<name>.pfm + dispColor/ + errDispColor/ PNGs
    via the KITTI colorizers (main_msnet.py:621-642); Scene Flow saves every
    50th frame only (main_msnet.py:593)
  * averages printed over all frames (main_msnet.py:643-647)
"""
from __future__ import annotations

import functools
import os
from os.path import join as pjoin
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import pfm as pfmio
from ..data import resolvers
from ..data.pipeline import TestPipeline, TestSample
from ..models import build_model
from ..ops.features import ms_features_test
from ..utils.colormap import kt15_error_log_color, kt15_false_color
from . import loss as L


def dataset_threshold(data_cfg) -> float:
    if data_cfg.eth3d or data_cfg.middlebury:
        return 1.0
    if data_cfg.kitti2012 or data_cfg.kitti2015:
        return 3.0
    return 1.0


class Evaluator:
    def __init__(self, cfg: Config, variables: Dict, mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg.model)
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        if "quant_stats" in variables:
            self.variables["quant_stats"] = variables["quant_stats"]
        self.mesh = mesh
        self._fwd_cache = {}
        self._calib_cache = {}
        # Static int8 activation scales need a calibration pass (records
        # per-layer input absmax into the quant_stats collection). It runs
        # lazily on the first frame of EVERY new input shape, max-accumulating
        # the absmax (the calib forward uses jnp.maximum), so mixed-shape test
        # lists (e.g. Middlebury + ETH3D) don't saturate on frames larger than
        # the first. Checkpoints without quant_stats — or with an untouched
        # all-zero quant_stats collection from model init (which would
        # silently collapse every activation to saturated +-127, scale
        # 1e-12/127) — both calibrate before the first static forward.
        self._static_quant = (
            getattr(cfg.model, "quant_eval", False)
            and getattr(cfg.model, "quant_mode", "dynamic") == "static")
        qs = self.variables.get("quant_stats")
        if qs is not None and all(
                not np.any(np.asarray(v)) for v in jax.tree_util.tree_leaves(qs)):
            del self.variables["quant_stats"]

    def _calibrate(self, iml: np.ndarray, imr: np.ndarray):
        """One forward in quant_mode='calib' (bf16 compute) to record each
        quantized conv's input absmax; the static model then quantizes with
        those fixed scalars — no per-input max pass (PERF.md int8 verdict).

        Runs jitted under the active mesh with the same sharding constraint
        as _forward, so multi-chip calibration follows the sharded execution
        path instead of an eager single-device one."""
        import dataclasses
        shape = iml.shape
        if shape not in self._calib_cache:
            calib_cfg = dataclasses.replace(self.cfg.model, quant_mode="calib")
            calib_model = build_model(calib_cfg)
            mcfg = self.cfg.matching
            max_disp = self.cfg.model.max_disp
            mesh = self.mesh
            fdt = jnp.bfloat16 if self.cfg.model.compute_dtype == "bfloat16" \
                else jnp.float32

            def calib(variables, a, b):
                from ..parallel import mesh as pm
                f = ms_features_test(a, b, max_disp, mcfg, mcfg.left_only,
                                     fdt)[None]
                if mesh is not None:
                    f = jax.lax.with_sharding_constraint(
                        f, pm.shard(mesh, pm.VOLUME))
                with pm.active_mesh(mesh):
                    _, qs = calib_model.apply(variables, f, train=False,
                                              mutable=["quant_stats"])
                return qs

            self._calib_cache[shape] = jax.jit(calib)
        # a missing quant_stats collection is created (zeros) by the mutable
        # apply; on later shapes jnp.maximum accumulates over the prior values
        qs = self._calib_cache[shape](self.variables, jnp.asarray(iml),
                                      jnp.asarray(imr))
        # a layer whose recorded absmax is still 0 after calibration (its
        # input was exactly zero on the calib frame) would NaN-poison the
        # static forward (layers.py guard) with no diagnostic — name it here
        zero = [jax.tree_util.keystr(p) for p, v in
                jax.tree_util.tree_leaves_with_path(qs["quant_stats"])
                if not np.any(np.asarray(v))]
        if zero:
            raise ValueError(
                f"static int8 calibration recorded absmax=0 for {zero} on a "
                f"{iml.shape} frame — calibrate on a more representative "
                "frame or disable quant_eval")
        self.variables = dict(self.variables, **qs)

    def _forward(self, iml: np.ndarray, imr: np.ndarray) -> np.ndarray:
        """Full device path: features + model, jitted per input shape."""
        shape = iml.shape
        if self._static_quant and shape not in self._calib_cache:
            # variables is a jit argument, so previously-compiled shapes pick
            # up the widened scales on their next call without retracing
            self._calibrate(iml, imr)
        if shape not in self._fwd_cache:
            mcfg = self.cfg.matching
            max_disp = self.cfg.model.max_disp
            model = self.model
            mesh = self.mesh

            fdt = jnp.bfloat16 if self.cfg.model.compute_dtype == "bfloat16" \
                else jnp.float32

            def fwd(variables, a, b):
                from ..parallel import mesh as pm
                f = ms_features_test(a, b, max_disp, mcfg, mcfg.left_only,
                                     fdt)
                f = f[None]
                if mesh is not None:
                    f = jax.lax.with_sharding_constraint(
                        f, pm.shard(mesh, pm.VOLUME))
                with pm.active_mesh(mesh):
                    return model.apply(variables, f, train=False)

            self._fwd_cache[shape] = jax.jit(fwd)
        out = self._fwd_cache[shape](self.variables, jnp.asarray(iml),
                                     jnp.asarray(imr))
        return np.asarray(out)

    def run(self, log=print) -> Dict[str, float]:
        cfg = self.cfg
        os.makedirs(cfg.eval.result_dir, exist_ok=True)
        pipe = TestPipeline(cfg.data, cfg.matching, cfg.model.encoder_ds)
        threshold = dataset_threshold(cfg.data)
        named_ds = any([cfg.data.kitti2012, cfg.data.kitti2015,
                        cfg.data.eth3d, cfg.data.middlebury])
        avg_err = avg_rate = 0.0
        n_gt = 0
        missing_gt = []
        for it, s in enumerate(pipe):
            disp = self._forward(s.iml, s.imr)          # [1, crop_h, crop_w]
            disp = disp[0, s.crop_height - s.height:s.crop_height, :s.width]
            disp = np.ascontiguousarray(disp.astype(np.float32))

            save_name = pjoin(cfg.eval.result_dir,
                              resolvers.result_name(cfg.data.dataset, s.entry, it))
            if cfg.eval.save_pfm and (named_ds or it % 50 == 0):
                os.makedirs(os.path.dirname(save_name) or ".", exist_ok=True)
                pfmio.write_pfm(save_name, disp)

            disp_gt = None
            if s.disp_path and os.path.isfile(s.disp_path):
                disp_gt = pfmio.read_pfm(s.disp_path)
                disp_gt[disp_gt == np.inf] = 0.0
            else:
                missing_gt.append(s.entry)
            if disp_gt is not None:
                e, r = L.epe_rate(jnp.asarray(disp_gt), jnp.asarray(disp),
                                  cfg.model.max_disp, threshold)
                avg_err += float(e)
                avg_rate += float(r)
                n_gt += 1
                if it % 5 == 0:
                    log(f"===> Frame {it}: {s.entry} ==> EPE: {float(e):.4f}, "
                        f"Bad-{threshold:.1f}: {float(r):.4f}")

            if cfg.eval.save_color and named_ds:
                self._save_colors(save_name, disp, disp_gt)

        out = {}
        if missing_gt:
            # averages must be over the frames actually scored — dividing by
            # len(pipe) would silently deflate EPE/bad-rate on any list with
            # missing GT (reference lists always have GT, main_msnet.py:643-647)
            log(f"WARNING: {len(missing_gt)} of {len(pipe)} frames have no GT "
                f"and were excluded from the averages: "
                f"{', '.join(missing_gt[:10])}"
                + (" ..." if len(missing_gt) > 10 else ""))
        if n_gt:
            out = {"avg_epe": avg_err / n_gt, "avg_bad": avg_rate / n_gt,
                   "threshold": threshold, "frames": n_gt}
            log(f"===> Total {n_gt} Frames ==> AVG EPE: {out['avg_epe']:.4f}, "
                f"AVG Bad-{threshold:.1f}: {out['avg_bad']:.4f}")
        return out

    def _save_colors(self, save_name: str, disp, disp_gt):
        import cv2
        base = os.path.basename(save_name)[:-4] + ".png"
        d = pjoin(self.cfg.eval.result_dir, "dispColor")
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(pjoin(d, base),
                    kt15_false_color(disp).astype(np.uint8)[:, :, ::-1])
        if disp_gt is not None:
            d = pjoin(self.cfg.eval.result_dir, "errDispColor")
            os.makedirs(d, exist_ok=True)
            cv2.imwrite(pjoin(d, base),
                        kt15_error_log_color(disp, disp_gt).astype(np.uint8)[:, :, ::-1])


def eval_bad_x(cfg: Config, log=print) -> Dict[str, float]:
    """Offline re-scoring of saved PFMs vs GT (main_msnet.py:655-706).

    KITTI only in the reference; here any dataset with resolvable GT paths.
    """
    entries = resolvers.load_list(cfg.data.test_list)
    threshold = cfg.eval.threshold
    avg_err = avg_rate = 0.0
    for entry in entries:
        paths = resolvers.resolve(cfg.data.dataset, cfg.data.data_path, entry)
        disp_gt = pfmio.read_pfm(paths[2])
        disp_gt[disp_gt == np.inf] = 0.0
        name = resolvers.result_name(cfg.data.dataset, entry, 0)
        save = pjoin(cfg.eval.result_dir, name)
        if not os.path.isfile(save):
            save = pjoin(cfg.eval.result_dir, "disp-pfm", name)
        disp = pfmio.read_pfm(save)
        e, r = L.epe_rate(jnp.asarray(disp_gt), jnp.asarray(disp),
                          cfg.model.max_disp, threshold)
        avg_err += float(e)
        avg_rate += float(r)
    n = len(entries)
    out = {"avg_epe": avg_err / n, "avg_bad": avg_rate / n, "frames": n}
    log(f"===> Total {n} Frames ==> AVG EPE: {out['avg_epe']:.4f}, "
        f"AVG Bad-{threshold:.1f}: {out['avg_bad']:.4f}")
    return out
