"""Trainer: jitted train step with the on-device MS-feature stage.

Re-designs the reference training loop (reference main_msnet.py:325-528)
TPU-first: one jit-compiled function takes uint8 image crops, computes the
matching-space features, runs the 3-D regularizer, loss, gradients, Adam
update and BatchNorm stat updates — all on device, with sharding annotations
for the (data, spatial, disp) mesh. The host only decodes/crops images.

Parity elements:
  * Adam(lr, betas=(0.9, 0.999)) (main_msnet.py:192)
  * LR schedule: lr for epoch <= 200, then lr * 0.1 (main_msnet.py:223-231)
  * loss selection per model/dataset (main_msnet.py:389-405)
  * per-step metrics: loss, EPE (MAE on valid mask), accu3
  * checkpoint cadence: every epoch (Scene Flow) / every 25 (KITTI), final
    always (main_msnet.py:518-526, 772-782); epoch-addressable names
  * per-epoch reshuffle (dataset.py:272-279) — here a seeded permutation
"""
from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import Config
from ..models import build_model
from ..ops.features import ms_features_train
from . import checkpoint as ckpt
from . import loss as L


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(lr: float):
    """Adam with injectable learning rate (epoch LR schedule)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=0.9, b2=0.999)


def epoch_lr(base_lr: float, epoch: int, decay_epoch: int = 200,
             factor: float = 0.1) -> float:
    """main_msnet.py:223-231 (epoch is 1-based)."""
    return base_lr if epoch <= decay_epoch else base_lr * factor


class Trainer:
    """Owns model, optimizer, jitted step, checkpoints."""

    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg.model, remat=cfg.train.remat,
                                 remat_scope=getattr(cfg.train, "remat_scope",
                                                     "all"))
        self.tx = make_optimizer(cfg.train.lr)
        self.mesh = mesh
        self.is_kitti = cfg.data.kitti2012 or cfg.data.kitti2015
        self._step_fns = {}
        self._async_ckpt = None

    # -- state ------------------------------------------------------------
    def init_state(self, sample_feats_shape: Tuple[int, ...],
                   seed: int = 0) -> TrainState:
        x = jnp.zeros(sample_feats_shape, jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(seed), x, train=False)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=self.tx.init(params))

    def feats_shape_for(self, batch_size: int) -> Tuple[int, ...]:
        t, m = self.cfg.train, self.cfg.matching
        s = m.ds_scale
        return (batch_size, self.cfg.model.max_disp // s,
                t.crop_height // s, t.crop_width // s, m.feature_channels)

    # -- the jitted step --------------------------------------------------
    def _build_step(self, board_h: int, bwl: int, bwr: int):
        model = self.model
        tx = self.tx
        mcfg = self.cfg.matching
        max_disp = self.cfg.model.max_disp
        is_kitti = self.is_kitti
        thresh = self.cfg.train.loss2_thresh
        alpha = self.cfg.train.loss2_alpha
        is_psmnet = self.cfg.model.name == "MS-PSMNet"

        mesh = self.mesh

        from ..parallel import mesh as pm

        accum = self.cfg.train.grad_accum
        fdt = jnp.bfloat16 if self.cfg.model.compute_dtype == "bfloat16" \
            else jnp.float32

        def micro_grads(params, batch_stats, iml, imr, target):
            """features -> model -> loss -> grads for one micro-batch."""
            feats = jax.vmap(lambda a, b: ms_features_train(
                a, b, max_disp, mcfg, board_h, bwl, bwr,
                mcfg.left_only, fdt))(iml, imr)
            if mesh is not None:
                feats = jax.lax.with_sharding_constraint(
                    feats, pm.shard(mesh, pm.VOLUME))

            mask = L.train_valid_mask(target, max_disp)

            def loss_fn(params):
                out, upd = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    feats, train=True, mutable=["batch_stats"])
                if is_psmnet:
                    d0, d1, disp = out
                    loss = L.psmnet_loss(d0, d1, disp, target, mask,
                                         is_kitti, thresh, alpha)
                else:
                    disp = out
                    loss = L.gcnet_loss(disp, target, mask, is_kitti,
                                        thresh, alpha)
                return loss, (disp, upd["batch_stats"])

            (loss, (disp, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            metrics = {
                "loss": loss,
                "epe": L.epe(disp, target, mask),
                "accu3": L.valid_accu3(target, disp, mask),
            }
            return disp, new_bs, grads, metrics

        def step(state: TrainState, iml, imr, target, lr):
            # active_mesh lets the model's constrain_volume() calls
            # re-annotate deep volumes whose dims shrink below the mesh
            with pm.active_mesh(mesh):
                if accum == 1:
                    disp, new_bs, grads, metrics = micro_grads(
                        state.params, state.batch_stats, iml, imr, target)
                else:
                    # sequential micro-batches: gradients accumulate, BN
                    # running stats thread through (the semantics of
                    # consecutive reference steps); peak HBM holds only one
                    # micro-batch's activations
                    n = iml.shape[0]
                    assert n % accum == 0, (n, accum)
                    split = lambda x: x.reshape(
                        (accum, n // accum) + x.shape[1:])

                    def body(carry, xs):
                        bstats, gsum = carry
                        a, b, t = xs
                        disp, new_bs, g, m = micro_grads(
                            state.params, bstats, a, b, t)
                        return (new_bs, jax.tree.map(jnp.add, gsum, g)), (disp, m)

                    gzero = jax.tree.map(jnp.zeros_like, state.params)
                    (new_bs, gsum), (disps, ms) = jax.lax.scan(
                        body, (state.batch_stats, gzero),
                        (split(iml), split(imr), split(target)))
                    grads = jax.tree.map(lambda g: g / accum, gsum)
                    metrics = jax.tree.map(jnp.mean, ms)
                    disp = disps.reshape((n,) + disps.shape[2:])
            opt_state = state.opt_state._replace(
                hyperparams={**state.opt_state.hyperparams,
                             "learning_rate": lr})
            updates, new_opt = tx.update(grads, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      batch_stats=new_bs, opt_state=new_opt)
            return new_state, metrics, disp

        if mesh is not None:
            rep = pm.shard(mesh, pm.REPLICATED)
            return jax.jit(
                step,
                in_shardings=(rep, pm.shard(mesh, pm.IMAGES),
                              pm.shard(mesh, pm.IMAGES),
                              pm.shard(mesh, pm.TARGET), rep),
                out_shardings=(rep, rep, pm.shard(mesh, pm.DISPARITY)),
                donate_argnums=(0,))
        return jax.jit(step, donate_argnums=(0,))

    def step_fn(self, board_h: int, bwl: int, bwr: int):
        key = (board_h, bwl, bwr)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(*key)
        return self._step_fns[key]

    def matcher_probe_fn(self, board_h: int, bwl: int, bwr: int):
        """Jitted per-matcher argmin probe of the input cost channels —
        the reference's TensorBoard feature-quality images
        (main_msnet.py:443-458). Recomputes the device feature stage
        (~2.5 ms/pair), so call it only on summary steps; the train step
        itself stays a 3-tuple."""
        key = ("probe", board_h, bwl, bwr)
        if key not in self._step_fns:
            mcfg = self.cfg.matching
            max_disp = self.cfg.model.max_disp

            @jax.jit
            def probe(iml, imr):
                feats = jax.vmap(lambda a, b: ms_features_train(
                    a, b, max_disp, mcfg, board_h, bwl, bwr,
                    mcfg.left_only, jnp.bfloat16))(iml, imr)
                return jnp.argmin(feats[..., :4], axis=1).astype(jnp.float32)

            self._step_fns[key] = probe
        return self._step_fns[key]

    # -- epoch loop -------------------------------------------------------
    def train_epoch(self, state: TrainState, pipeline, epoch: int,
                    log_fn=None, start_iteration: int = 0,
                    ) -> Tuple[TrainState, Dict[str, float]]:
        """One epoch from batch ``start_iteration`` (mid-epoch resume:
        the pipeline replays exactly the batches an uninterrupted epoch
        would have seen from that point)."""
        lr = epoch_lr(self.cfg.train.lr, epoch, self.cfg.train.lr_decay_epoch,
                      self.cfg.train.lr_decay_factor)
        every = self.cfg.train.ckpt_every_steps
        tot = {"loss": 0.0, "epe": 0.0, "accu3": 0.0}
        n = 0
        for i, batch in enumerate(pipeline.epoch(epoch, start_iteration),
                                  start=start_iteration):
            t0 = time.time()
            fn = self.step_fn(batch["board_h"], batch["board_w_left"],
                              batch["board_w_right"])
            state, metrics, disp = fn(state, jnp.asarray(batch["iml"]),
                                      jnp.asarray(batch["imr"]),
                                      jnp.asarray(batch["disp"]),
                                      jnp.asarray(lr, jnp.float32))
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t0
            for k in tot:
                tot[k] += m[k]
            n += 1
            if log_fn is not None:
                log_fn(epoch=epoch, iteration=i, metrics=m, sec_per_step=dt,
                       state=state, disp=disp, batch=batch)
            if every and (i + 1) % every == 0:
                self.save_step(state, epoch, i + 1)
        avg = {k: v / max(n, 1) for k, v in tot.items()}
        avg["batches"] = n
        return state, avg

    # -- checkpointing ----------------------------------------------------
    def maybe_save(self, state: TrainState, epoch: int,
                   avg: Dict[str, float], final: bool = False):
        t = self.cfg.train
        cadence_ok = (epoch % t.kitti_ckpt_every == 0) if self.is_kitti else True
        if cadence_ok or final:
            # "batches" records how many batches the averages cover — after
            # a mid-epoch resume the epoch averages span only the replayed
            # tail (0 if the crash hit after the epoch's last step save)
            meta = {"loss": avg.get("loss"), "epe_err": avg.get("epe"),
                    "accu3": avg.get("accu3"),
                    "batches": avg.get("batches")}
            if t.async_ckpt:
                if self._async_ckpt is None:
                    self._async_ckpt = ckpt.AsyncCheckpointer()
                return self._async_ckpt.save(
                    t.checkpoint_dir, self.cfg.model.name, epoch, state,
                    meta=meta)
            return ckpt.save_checkpoint(
                t.checkpoint_dir, self.cfg.model.name, epoch, state,
                meta=meta)
        return None

    def save_step(self, state: TrainState, epoch: int, iteration: int) -> str:
        """Mid-epoch async checkpoint (step-granular recovery, §5.3): the
        sidecar meta records where to resume; always written async — the
        whole point is not stalling the step loop."""
        t = self.cfg.train
        if self._async_ckpt is None:
            self._async_ckpt = ckpt.AsyncCheckpointer()
        step = int(state.step)
        return self._async_ckpt.save(
            t.checkpoint_dir, self.cfg.model.name, epoch, state,
            meta={"epoch": epoch, "iteration": iteration},
            path=ckpt.step_ckpt_path(t.checkpoint_dir, self.cfg.model.name,
                                     step))

    def finish_checkpoints(self) -> None:
        """Drain pending async checkpoint writes (call before exiting or
        before another process resumes from the files)."""
        if self._async_ckpt is not None:
            self._async_ckpt.wait()

    def resume(self, state: TrainState, path: str) -> TrainState:
        """Resume from our msgpack or import a reference torch .tar."""
        if path.endswith(".tar"):
            variables = ckpt.load_weights_any(path, self.cfg.model.name)
            return state.replace(params=_merge_loose(state.params, variables["params"]),
                                 batch_stats=_merge_loose(state.batch_stats,
                                                          variables["batch_stats"]))
        restored, _ = ckpt.load_checkpoint(path, state)
        return restored


def _merge_loose(template, loaded):
    """strict=False load: take loaded leaves where paths+shapes match."""
    def merge(t, l):
        if isinstance(t, dict):
            return {k: merge(t[k], l[k]) if isinstance(l, dict) and k in l else t[k]
                    for k in t}
        arr = np.asarray(l)
        return jnp.asarray(arr) if arr.shape == tuple(t.shape) else t
    return merge(template, loaded)
