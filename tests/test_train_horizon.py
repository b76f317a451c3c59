"""Long-horizon train equivalence + bitwise checkpoint resume
(VERDICT r4 next-round item 5).

(a) ``test_sixty_step_horizon_crosses_lr_decay`` — 60 full train steps
    through the jitted Trainer.step_fn vs the reference-semantics CPU chain
    (NumPy-oracle features -> torch twin -> smooth-L1 on the reference valid
    mask -> torch Adam), with the LR stepping down 10x at the decay boundary
    mid-run via ``epoch_lr`` (reference main_msnet.py:223-231, here with a
    decay_epoch override so the boundary lands at step 30 of 60). The
    3-step golden (test_train_golden.py) pins the seams exactly; this test
    pins the *trajectory*: per-step losses must track inside a measured fp
    envelope over a horizon where compounding drift, a mis-wired decay
    factor, or momentum-state corruption would visibly diverge.

(b) ``test_async_checkpoint_resume_is_bitwise`` — an interrupted run
    (async mid-run save -> fresh Trainer -> load -> continue) must produce
    BIT-IDENTICAL params / opt_state / batch_stats / step counter to the
    uninterrupted run on the same batch stream. Reference bar: epoch-file
    resume, main_msnet.py:199-207,509-526; ours is step-granular and exact
    (same jitted program + same inputs is deterministic on one device, so
    any difference is a save/load round-trip defect).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                               ModelConfig, TrainConfig)
from msnets_tpu.engine import Trainer
from msnets_tpu.engine.trainer import epoch_lr

MAX_DISP = 32
CROP_H, CROP_W = 64, 128
FILTERS = 8
LR = 1e-3


def _cfg(**train_kw):
    return Config(
        matching=MatchingConfig(),
        model=ModelConfig(name="MS-GCNet", max_disp=MAX_DISP,
                          base_filters=FILTERS, compute_dtype="float32"),
        train=TrainConfig(crop_height=CROP_H, crop_width=CROP_W,
                          batch_size=1, lr=LR, remat=False, **train_kw),
        data=DataConfig(),
    )


def _batch(step: int, mcfg):
    """Deterministic uint8 crop pair with true disparity 8 + constant GT."""
    bh, bwl = mcfg.board_h, MAX_DISP
    shape = (CROP_H + 2 * bh, CROP_W + bwl)
    rng = np.random.default_rng((1234, step))
    base = rng.integers(0, 256, (shape[0], shape[1] + 8)).astype(np.uint8)
    iml, imr = base[:, :shape[1]], base[:, 8:]
    gt = np.full((CROP_H, CROP_W), 8.0, np.float32)
    return iml, imr, gt


def test_epoch_lr_reference_boundary():
    """main_msnet.py:223-231: lr holds through epoch<=decay_epoch (default
    200), then multiplies by the decay factor (default 0.1)."""
    assert epoch_lr(1e-3, 200) == pytest.approx(1e-3)
    assert epoch_lr(1e-3, 201) == pytest.approx(1e-4)
    assert epoch_lr(2e-3, 30, decay_epoch=30, factor=0.5) == pytest.approx(2e-3)
    assert epoch_lr(2e-3, 31, decay_epoch=30, factor=0.5) == pytest.approx(1e-3)


@pytest.mark.parity
@pytest.mark.slow
def test_sixty_step_horizon_crosses_lr_decay():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF
    from msnets_tpu.models.torch_convert import convert_state_dict
    from msnets_tpu.ops import features as F
    from msnets_tpu.ops import oracle_np as O
    from . import torch_ref

    STEPS, DECAY_EPOCH, FACTOR = 60, 30, 0.1
    mcfg = MatchingConfig()
    cfg = _cfg(lr_decay_epoch=DECAY_EPOCH, lr_decay_factor=FACTOR)

    torch.manual_seed(7)
    tm = torch_ref.TorchGCNet(max_disp=MAX_DISP, cin=8, F=FILTERS)
    tm.train()
    variables = convert_state_dict(tm.state_dict(), "MS-GCNet")

    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(1), seed=0)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tr.tx.init(variables["params"]))
    fn = tr.step_fn(mcfg.board_h, MAX_DISP, 0)

    opt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.9, 0.999))

    fw_losses, ref_losses = [], []
    for step in range(1, STEPS + 1):
        # one step per "epoch": the decay boundary lands mid-horizon. Both
        # chains draw the lr from the SAME schedule function under test.
        lr_t = epoch_lr(LR, step, cfg.train.lr_decay_epoch,
                        cfg.train.lr_decay_factor)
        iml, imr, gt = _batch(step, mcfg)

        state, metrics, _ = fn(state, jnp.asarray(iml[None]),
                               jnp.asarray(imr[None]), jnp.asarray(gt[None]),
                               jnp.asarray(lr_t, jnp.float32))
        fw_losses.append(float(metrics["loss"]))

        l2, r2 = F.downsample_half_np(iml), F.downsample_half_np(imr)
        costs = O.get_costs(l2, r2, MAX_DISP // 2, mcfg.censw, mcfg.nccw,
                            mcfg.sadw, mcfg.sobelw,
                            board_h=mcfg.board_h // 2,
                            board_w_left=MAX_DISP // 2, board_w_right=0)
        feats = O.extract_features_left(
            *costs, cens_sigma=mcfg.cens_sigma, ncc_sigma=mcfg.ncc_sigma,
            sad_sigma=mcfg.sad_sigma, sobel_sigma=mcfg.sobel_sigma)
        for g in opt.param_groups:
            g["lr"] = lr_t
        disp = tm(torch.from_numpy(feats[None]))
        tgt = torch.from_numpy(gt[None])
        mask = (tgt - MAX_DISP) * tgt < 0             # main_msnet.py:382
        loss = tF.smooth_l1_loss(disp[mask], tgt[mask])
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    fw = np.asarray(fw_losses)
    ref = np.asarray(ref_losses)
    rel = np.abs(fw - ref) / np.maximum(np.abs(ref), 1e-6)

    # measured envelope (CPU fp32, this seed): rel drift grows from ~1e-4
    # over the first steps to a few percent near the horizon as fp
    # reassociation compounds through Adam; a wiring bug (wrong decay
    # factor, stale momentum, unmasked loss) is orders of magnitude larger.
    assert rel[:5].max() < 2e-2, (rel[:5], fw[:5], ref[:5])
    assert np.median(rel) < 0.10, (np.median(rel), rel)
    assert rel.max() < 0.35, (rel.argmax(), rel.max(), fw, ref)

    # both chains must actually have LEARNED (the horizon is a real
    # trajectory, not noise): late-loss well below early-loss
    assert fw[-10:].mean() < 0.35 * fw[:5].mean(), (fw[:5], fw[-10:])
    # and the decay boundary did engage in the framework chain: the lr fed
    # at step 31+ is 10x smaller
    assert epoch_lr(LR, DECAY_EPOCH + 1, DECAY_EPOCH, FACTOR) == \
        pytest.approx(LR * FACTOR)


@pytest.mark.parity
def test_async_checkpoint_resume_is_bitwise(tmp_path):
    mcfg = MatchingConfig()
    cfg = _cfg(checkpoint_dir=str(tmp_path), async_ckpt=True)
    TOTAL, CUT = 6, 3

    def fresh_state(tr):
        return tr.init_state(tr.feats_shape_for(1), seed=3)

    # uninterrupted run, saving asynchronously at the cut WITHOUT stopping
    tr_a = Trainer(cfg)
    state_a = fresh_state(tr_a)
    fn_a = tr_a.step_fn(mcfg.board_h, MAX_DISP, 0)
    for step in range(1, TOTAL + 1):
        iml, imr, gt = _batch(step, mcfg)
        state_a, _, _ = fn_a(state_a, jnp.asarray(iml[None]),
                             jnp.asarray(imr[None]), jnp.asarray(gt[None]),
                             jnp.asarray(LR, jnp.float32))
        if step == CUT:
            path = tr_a.save_step(state_a, epoch=1, iteration=step)
    tr_a.finish_checkpoints()
    assert os.path.exists(path), path

    # interrupted run: fresh Trainer + state template, load the async file,
    # replay the remaining batches
    tr_b = Trainer(cfg)
    state_b = tr_b.resume(fresh_state(tr_b), path)
    assert int(state_b.step) == CUT
    fn_b = tr_b.step_fn(mcfg.board_h, MAX_DISP, 0)
    for step in range(CUT + 1, TOTAL + 1):
        iml, imr, gt = _batch(step, mcfg)
        state_b, _, _ = fn_b(state_b, jnp.asarray(iml[None]),
                             jnp.asarray(imr[None]), jnp.asarray(gt[None]),
                             jnp.asarray(LR, jnp.float32))

    # BITWISE equality of every leaf: params, Adam moments, BN stats, step
    assert int(state_b.step) == int(state_a.step) == TOTAL
    for name, tree_a, tree_b in (
            ("params", state_a.params, state_b.params),
            ("opt_state", state_a.opt_state, state_b.opt_state),
            ("batch_stats", state_a.batch_stats, state_b.batch_stats)):
        la = jax.tree_util.tree_leaves_with_path(tree_a)
        lb = dict(jax.tree_util.tree_leaves_with_path(tree_b))
        assert len(la) == len(lb)
        for p, a in la:
            a, b = np.asarray(a), np.asarray(lb[p])
            assert a.dtype == b.dtype, (name, p)
            assert np.array_equal(a, b), (
                f"{name}{p}: resumed run diverged "
                f"(maxdiff {np.abs(a - b).max()})")
