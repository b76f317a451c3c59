"""MS-PSMNet end-to-end golden chains (VERDICT r3 item 3).

Mirrors the two MS-GCNet goldens for the stacked-hourglass model:

  * eval:  a synthetic KITTI-native 375x1242 pair through the COMPLETE
    framework chain (resolvers -> host pad -> device ms_features_test ->
    MSPSMNet with converter-shared weights -> un-pad -> EPE -> PFM) vs the
    reference-semantics CPU chain (generate_test_cbmv pad -> NumPy oracle
    features -> Torch twin eval forward). Narrow width (F=8) keeps the CPU
    runtime tractable; the architecture (3 hourglasses, cumulative heads,
    trilinear upsample) is the full one.
    Reference: main_msnet.py:533-648, psmnet_3dcnn.py:92-179.

  * train: THREE full Trainer.step_fn steps vs oracle features + Torch twin
    + torch.optim.Adam, exercising the 3-head 0.2/0.6/1.0 loss seam
    (main_msnet.py:396-405) and the cumulative-sum head wiring
    (psmnet_3dcnn.py:136-147) under real gradients.
"""
import os
from os.path import join as pjoin

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

from msnets_tpu.config import (Config, DataConfig, EvalConfig, MatchingConfig,
                               ModelConfig, TrainConfig)
from msnets_tpu.data import pfm as pfmio
from msnets_tpu.engine import Evaluator, Trainer
from msnets_tpu.engine import loss as L
from msnets_tpu.models.torch_convert import convert_state_dict
from msnets_tpu.ops import features as F
from msnets_tpu.ops import oracle_np as O

from . import torch_ref

FILTERS = 8                # full architecture, narrow width (CPU runtime)


def _oracle_features(iml, imr, mcfg, max_disp):
    """Host twin of ms_features_train (generate_crop_train_cbmv semantics)."""
    l2 = F.downsample_half_np(iml)
    r2 = F.downsample_half_np(imr)
    costs = O.get_costs(l2, r2, max_disp // 2, mcfg.censw, mcfg.nccw,
                        mcfg.sadw, mcfg.sobelw,
                        board_h=mcfg.board_h // 2,
                        board_w_left=max_disp // 2, board_w_right=0)
    return O.extract_features_left(
        *costs, cens_sigma=mcfg.cens_sigma, ncc_sigma=mcfg.ncc_sigma,
        sad_sigma=mcfg.sad_sigma, sobel_sigma=mcfg.sobel_sigma)


@pytest.mark.slow
def test_psmnet_full_chain_golden_vs_reference_semantics(tmp_path):
    """KITTI-native eval chain: Evaluator.run vs oracle+torch twin."""
    import cv2
    H, W, DISP, MAX_DISP = 375, 1242, 10, 192
    rng = np.random.default_rng(20260820)
    base = rng.integers(0, 256, (H, W + DISP)).astype(np.float32)
    k = np.ones(5, np.float32) / 5.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    base = ((base - base.min()) / (np.ptp(base) + 1e-9) * 255).astype(np.uint8)
    left, right = base[:, DISP:], base[:, :W]

    for d in ("image_0", "image_1", "disp_occ_0_pfm"):
        (tmp_path / d).mkdir()
    entry = "000000_10.png"
    cv2.imwrite(str(tmp_path / "image_0" / entry), left)
    cv2.imwrite(str(tmp_path / "image_1" / entry), right)
    gt = np.full((H, W), float(DISP), np.float32)
    pfmio.write_pfm(str(tmp_path / "disp_occ_0_pfm" / "000000_10.pfm"), gt)
    (tmp_path / "t.list").write_text(entry + "\n")

    torch.manual_seed(7)
    tm = torch_ref.TorchPSMNet(max_disp=MAX_DISP, cin=8, upscale=2, F=FILTERS)
    tm.eval()
    variables = convert_state_dict(tm.state_dict(), "MS-PSMNet")

    cfg = Config(
        matching=MatchingConfig(),
        model=ModelConfig(name="MS-PSMNet", max_disp=MAX_DISP,
                          base_filters=FILTERS, compute_dtype="float32",
                          encoder_ds=32),
        data=DataConfig(data_path=str(tmp_path), kitti2015=1,
                        test_list=str(tmp_path / "t.list")),
        eval=EvalConfig(result_dir=str(tmp_path / "res")),
    )
    ev = Evaluator(cfg, {"params": variables["params"],
                         "batch_stats": variables["batch_stats"]})
    out = ev.run(log=lambda *a, **k: None)
    assert out["frames"] == 1 and out["threshold"] == 3.0
    disp_fw = pfmio.read_pfm(pjoin(cfg.eval.result_dir, "000000_10.pfm"))
    assert disp_fw.shape == (H, W)

    # reference-semantics CPU chain (same pad arithmetic as the GCNet golden)
    ds = 32
    ch = H + (ds - H % ds) % ds
    cw = W + (ds - W % ds) % ds
    iml = np.pad(left, ((ch - H, 0), (0, cw - W)))
    imr = np.pad(right, ((ch - H, 0), (0, cw - W)))
    l2 = F.downsample_half_np(iml)
    r2 = F.downsample_half_np(imr)
    b = 10
    l2, r2 = np.pad(l2, b), np.pad(r2, b)
    mc = cfg.matching
    costs = O.get_costs(l2, r2, MAX_DISP // mc.ds_scale,
                        mc.censw, mc.nccw, mc.sadw, mc.sobelw,
                        board_h=b, board_w_left=b, board_w_right=b)
    feats = O.extract_features_left(
        *costs, cens_sigma=mc.cens_sigma, ncc_sigma=mc.ncc_sigma,
        sad_sigma=mc.sad_sigma, sobel_sigma=mc.sobel_sigma)
    with torch.no_grad():
        disp_ref = tm(torch.from_numpy(feats[None])).numpy()[0]
    disp_ref = disp_ref[ch - H:ch, :W]

    np.testing.assert_allclose(disp_fw, disp_ref, atol=5e-3)
    e_fw, r_fw = L.epe_rate(jnp.asarray(gt), jnp.asarray(disp_fw),
                            MAX_DISP, 3.0)
    e_rf, r_rf = L.epe_rate(jnp.asarray(gt), jnp.asarray(disp_ref),
                            MAX_DISP, 3.0)
    assert float(e_fw) == pytest.approx(float(e_rf), abs=1e-3)
    assert float(r_fw) == pytest.approx(float(r_rf), abs=1e-4)
    assert out["avg_epe"] == pytest.approx(float(e_fw), abs=1e-4)


@pytest.mark.slow
def test_psmnet_three_train_steps_match_reference_chain():
    """3 jitted PSMNet train steps vs the torch Adam chain (3-head loss)."""
    MAX_DISP, CROP_H, CROP_W, LR, STEPS = 32, 64, 128, 1e-3, 3
    mcfg = MatchingConfig()
    cfg = Config(
        matching=mcfg,
        model=ModelConfig(name="MS-PSMNet", max_disp=MAX_DISP,
                          base_filters=FILTERS, compute_dtype="float32"),
        train=TrainConfig(crop_height=CROP_H, crop_width=CROP_W,
                          batch_size=1, lr=LR, remat=False),
        data=DataConfig(),
    )
    bh, bwl = mcfg.board_h, MAX_DISP
    shape = (CROP_H + 2 * bh, CROP_W + bwl)
    batches = []
    for step in range(STEPS):
        rng = np.random.default_rng((43, step))
        base = rng.integers(0, 256, (shape[0], shape[1] + 8)).astype(np.uint8)
        iml, imr = base[:, :shape[1]], base[:, 8:]
        gt = np.full((CROP_H, CROP_W), 8.0, np.float32)
        batches.append((iml, imr, gt))

    torch.manual_seed(13)
    tm = torch_ref.TorchPSMNet(max_disp=MAX_DISP, cin=8, upscale=2, F=FILTERS)
    tm.train()
    variables = convert_state_dict(tm.state_dict(), "MS-PSMNet")

    # --- framework: jitted train steps ----------------------------------
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

    # --- reference-semantics chain: 3-head 0.2/0.6/1.0 loss -------------
    opt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.9, 0.999))
    ref_losses = []
    for iml, imr, gt in batches:
        feats = _oracle_features(iml, imr, mcfg, MAX_DISP)
        d0, d1, d2 = tm(torch.from_numpy(feats[None]))
        tgt = torch.from_numpy(gt[None])
        mask = (tgt - MAX_DISP) * tgt < 0
        loss = (0.2 * tF.smooth_l1_loss(d0[mask], tgt[mask])
                + 0.6 * tF.smooth_l1_loss(d1[mask], tgt[mask])
                + 1.0 * tF.smooth_l1_loss(d2[mask], tgt[mask]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    for a, b in zip(fw_losses, ref_losses):
        assert a == pytest.approx(b, rel=2e-3, abs=2e-3), (fw_losses,
                                                           ref_losses)

    got = convert_state_dict(tm.state_dict(), "MS-PSMNet")
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
    assert all_d.mean() < 1.5e-3, all_d.mean()

    bs = dict(jax.tree_util.tree_leaves_with_path(state.batch_stats))
    for path, want in jax.tree_util.tree_leaves_with_path(
            got["batch_stats"]):
        np.testing.assert_allclose(np.asarray(bs[path]), np.asarray(want),
                                   rtol=2e-2, atol=2e-2, err_msg=str(path))
