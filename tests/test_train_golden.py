"""Training-seam golden test (companion to test_golden_chain.py).

THREE full train steps run through the framework's jitted Trainer.step_fn
(uint8 crops -> device ms_features_train -> MS-GCNet -> masked smooth-L1 ->
Adam -> BN stat updates) and through the reference-semantics CPU chain
(host downsample -> NumPy oracle matchers/AML -> Torch twin forward ->
F.smooth_l1_loss on the same valid mask -> torch.optim.Adam), starting from
identical converter-shared weights and identical per-step batches.

Catches drift in ANY train seam: feature scaling, margin arithmetic, the
loss/mask pair (main_msnet.py:382-395), Adam hyperparameters/epsilon
placement (main_msnet.py:192), LR wiring, and BN momentum semantics.

Tolerances: per-step losses must agree to ~2e-3; parameters after 3 steps to
2*lr*STEPS = 6e-3 absolute — Adam's bias-corrected first steps move every
component by ~±lr exactly, so a near-zero-gradient component whose SIGN
differs between the fp32 conv implementations legitimately diverges by 2*lr
per step (measured: max 5.96e-3, mean 6.4e-4, 6% of components flip at some
step). Any WIRING bug — wrong lr, an unmasked loss, swapped betas, a broken
feature seam — violates the per-step losses and blows the mean drift.
"""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                               ModelConfig, TrainConfig)
from msnets_tpu.engine import Trainer
from msnets_tpu.models.torch_convert import convert_state_dict
from msnets_tpu.ops import features as F
from msnets_tpu.ops import oracle_np as O

from . import torch_ref

MAX_DISP = 32
CROP_H, CROP_W = 64, 128
FILTERS = 8
LR = 1e-3
STEPS = 3


def _batches(mcfg):
    """Deterministic per-step uint8 crops (with margins) + constant GT."""
    bh, bwl = mcfg.board_h, MAX_DISP
    shape = (CROP_H + 2 * bh, CROP_W + bwl)
    out = []
    for step in range(STEPS):
        rng = np.random.default_rng((42, step))
        base = rng.integers(0, 256, (shape[0], shape[1] + 8)).astype(np.uint8)
        # left[j] == right[j - 8] -> true disparity +8 (the matcher search
        # direction; left = base[:, :W], right = base[:, 8:])
        iml, imr = base[:, :shape[1]], base[:, 8:]
        gt = np.full((CROP_H, CROP_W), 8.0, np.float32)
        out.append((iml, imr, gt))
    return out


def _oracle_features(iml, imr, mcfg):
    """Host twin of ms_features_train (generate_crop_train_cbmv semantics):
    downsample x1/2, matchers at maxdisp/2 with margins/2, 8-ch assembly."""
    l2 = F.downsample_half_np(iml)
    r2 = F.downsample_half_np(imr)
    costs = O.get_costs(l2, r2, MAX_DISP // 2, mcfg.censw, mcfg.nccw,
                        mcfg.sadw, mcfg.sobelw,
                        board_h=mcfg.board_h // 2,
                        board_w_left=MAX_DISP // 2, board_w_right=0)
    return O.extract_features_left(
        *costs, cens_sigma=mcfg.cens_sigma, ncc_sigma=mcfg.ncc_sigma,
        sad_sigma=mcfg.sad_sigma, sobel_sigma=mcfg.sobel_sigma)


@pytest.mark.slow
def test_three_train_steps_match_reference_chain():
    mcfg = MatchingConfig()
    cfg = Config(
        matching=mcfg,
        model=ModelConfig(name="MS-GCNet", max_disp=MAX_DISP,
                          base_filters=FILTERS, compute_dtype="float32"),
        train=TrainConfig(crop_height=CROP_H, crop_width=CROP_W,
                          batch_size=1, lr=LR, remat=False),
        data=DataConfig(),
    )
    batches = _batches(mcfg)

    # shared starting weights
    torch.manual_seed(11)
    tm = torch_ref.TorchGCNet(max_disp=MAX_DISP, cin=8, F=FILTERS)
    tm.train()
    variables = convert_state_dict(tm.state_dict(), "MS-GCNet")

    # --- framework: jitted train steps ---------------------------------
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(1), seed=0)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tr.tx.init(variables["params"]))
    fn = tr.step_fn(mcfg.board_h, MAX_DISP, 0)
    fw_losses = []
    for iml, imr, gt in batches:
        state, metrics, _ = fn(state, jnp.asarray(iml[None]),
                               jnp.asarray(imr[None]), jnp.asarray(gt[None]),
                               jnp.asarray(LR, jnp.float32))
        fw_losses.append(float(metrics["loss"]))

    # --- reference-semantics chain -------------------------------------
    opt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.9, 0.999))
    ref_losses = []
    for iml, imr, gt in batches:
        feats = _oracle_features(iml, imr, mcfg)          # [8, D, H, W]
        x = torch.from_numpy(feats[None])
        disp = tm(x)                                      # [1, crop_h, crop_w]
        tgt = torch.from_numpy(gt[None])
        mask = (tgt - MAX_DISP) * tgt < 0                 # main_msnet.py:382
        loss = tF.smooth_l1_loss(disp[mask], tgt[mask])
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    # per-step losses: tight agreement (catches loss/mask/feature drift)
    for a, b in zip(fw_losses, ref_losses):
        assert a == pytest.approx(b, rel=2e-3, abs=2e-3), (fw_losses,
                                                           ref_losses)

    # parameters after 3 Adam steps
    got = convert_state_dict(tm.state_dict(), "MS-GCNet")
    import jax
    ours = dict(jax.tree_util.tree_leaves_with_path(state.params))
    diffs = []
    bound = 2 * LR * STEPS * 1.1            # Adam sign-flip ceiling + slack
    for path, want in jax.tree_util.tree_leaves_with_path(got["params"]):
        have = np.asarray(ours[path])
        d = np.abs(have - np.asarray(want))
        diffs.append(d.ravel())
        np.testing.assert_allclose(have, np.asarray(want), atol=bound,
                                   err_msg=str(path))
    all_d = np.concatenate(diffs)
    assert all_d.mean() < 1.5e-3, all_d.mean()  # drift, not disagreement

    # BN running stats follow the same momentum semantics. Tolerance is
    # loose on purpose: by step 3 the stats are computed from activations of
    # already-(legitimately-)diverged params, so they inherit that scale of
    # difference; a momentum-semantics bug (flax m vs torch 1-m) would be
    # O(0.5) off after three 0.1-weighted updates.
    bs = dict(jax.tree_util.tree_leaves_with_path(state.batch_stats))
    for path, want in jax.tree_util.tree_leaves_with_path(
            got["batch_stats"]):
        np.testing.assert_allclose(np.asarray(bs[path]), np.asarray(want),
                                   rtol=2e-2, atol=2e-2, err_msg=str(path))
