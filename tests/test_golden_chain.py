"""ONE end-to-end golden seam test (VERDICT r2 missing #1).

A synthetic-but-realistic KITTI-native 375x1242 uint8 pair runs through the
COMPLETE eval chain twice:

  framework chain:  KITTI-2015 tree on disk -> Evaluator.run
                    (resolvers -> make_test_sample host pad -> device
                    ms_features_test -> MSGCNet with weights converted from a
                    Torch state_dict -> un-pad -> EPE -> PFM result)

  reference-semantics CPU chain: the same pad (generate_test_cbmv,
                    cbmv_generator.py:780-788) -> host downsample_half_np ->
                    10-px border pad (cbmv_generator.py:818-823) -> NumPy
                    oracle get_costs + extract_features_left -> Torch twin
                    forward (main_msnet.py:533-648) -> same un-pad -> same
                    metric

The two disparity maps must agree to the established model-parity tolerance:
if ANY seam (padding, margins, downsample, matcher numerics, AML, layout,
checkpoint converter, head, un-pad, metric) drifts, this fails.
"""
import os
from os.path import join as pjoin

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from msnets_tpu.config import (Config, DataConfig, EvalConfig, MatchingConfig,
                               ModelConfig)
from msnets_tpu.data import pfm as pfmio
from msnets_tpu.engine import Evaluator
from msnets_tpu.engine import loss as L
from msnets_tpu.models.torch_convert import convert_state_dict
from msnets_tpu.ops import features as F
from msnets_tpu.ops import oracle_np as O

from . import torch_ref

H, W = 375, 1242           # KITTI-2015 native frame size
DISP = 10                  # constant true shift of the synthetic pair
MAX_DISP = 192
FILTERS = 8                # full architecture, narrow width (CPU runtime)


def _synthetic_kitti_pair():
    """Textured pair with constant disparity DISP: left[i,j] == right[i,j-DISP].

    Smooth blotchy texture (random field box-filtered) so census/NCC windows
    are discriminative yet realistic; uint8 like a real PNG decode."""
    rng = np.random.default_rng(20260820)
    base = rng.integers(0, 256, (H, W + DISP)).astype(np.float32)
    k = np.ones(5, np.float32) / 5.0
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, base)
    base = ((base - base.min()) / (np.ptp(base) + 1e-9) * 255).astype(np.uint8)
    left = base[:, DISP:]
    right = base[:, :W]
    return left, right


@pytest.mark.slow
def test_full_chain_golden_vs_reference_semantics(tmp_path):
    import cv2
    left, right = _synthetic_kitti_pair()

    # --- KITTI-2015 tree on disk -------------------------------------------
    for d in ("image_0", "image_1", "disp_occ_0_pfm"):
        (tmp_path / d).mkdir()
    entry = "000000_10.png"
    cv2.imwrite(str(tmp_path / "image_0" / entry), left)
    cv2.imwrite(str(tmp_path / "image_1" / entry), right)
    gt = np.full((H, W), float(DISP), np.float32)
    pfmio.write_pfm(str(tmp_path / "disp_occ_0_pfm" / "000000_10.pfm"), gt)
    (tmp_path / "t.list").write_text(entry + "\n")

    # --- shared weights: Torch twin -> converter ---------------------------
    torch.manual_seed(3)
    tm = torch_ref.TorchGCNet(max_disp=MAX_DISP, cin=8, F=FILTERS)
    tm.eval()
    variables = convert_state_dict(tm.state_dict(), "MS-GCNet")

    # --- framework chain: Evaluator.run over the real tree -----------------
    cfg = Config(
        matching=MatchingConfig(),
        model=ModelConfig(name="MS-GCNet", max_disp=MAX_DISP,
                          base_filters=FILTERS, compute_dtype="float32",
                          encoder_ds=32),
        data=DataConfig(data_path=str(tmp_path), kitti2015=1,
                        test_list=str(tmp_path / "t.list")),
        eval=EvalConfig(result_dir=str(tmp_path / "res")),
    )
    assert cfg.data.dataset == "kitti2015"
    ev = Evaluator(cfg, {"params": variables["params"],
                         "batch_stats": variables["batch_stats"]})
    out = ev.run(log=lambda *a, **k: None)
    assert out["frames"] == 1 and out["threshold"] == 3.0
    disp_fw = pfmio.read_pfm(pjoin(cfg.eval.result_dir, "000000_10.pfm"))
    assert disp_fw.shape == (H, W)

    # --- reference-semantics CPU chain -------------------------------------
    ds = 32
    ch = H + (ds - H % ds) % ds          # 384: pad top
    cw = W + (ds - W % ds) % ds          # 1248: pad right
    iml = np.pad(left, ((ch - H, 0), (0, cw - W)))
    imr = np.pad(right, ((ch - H, 0), (0, cw - W)))
    l2 = F.downsample_half_np(iml)
    r2 = F.downsample_half_np(imr)
    b = 10
    l2 = np.pad(l2, b)
    r2 = np.pad(r2, b)
    mc = cfg.matching
    costs = O.get_costs(l2, r2, MAX_DISP // mc.ds_scale,
                        mc.censw, mc.nccw, mc.sadw, mc.sobelw,
                        board_h=b, board_w_left=b, board_w_right=b)
    feats = O.extract_features_left(
        *costs, cens_sigma=mc.cens_sigma, ncc_sigma=mc.ncc_sigma,
        sad_sigma=mc.sad_sigma, sobel_sigma=mc.sobel_sigma)   # [8, D, H', W']
    with torch.no_grad():
        disp_ref = tm(torch.from_numpy(feats[None])).numpy()[0]  # [384, 1248]
    disp_ref = disp_ref[ch - H:ch, :W]

    # --- the seams must agree ----------------------------------------------
    np.testing.assert_allclose(disp_fw, disp_ref, atol=5e-3)
    e_fw, r_fw = L.epe_rate(jnp.asarray(gt), jnp.asarray(disp_fw),
                            MAX_DISP, 3.0)
    e_rf, r_rf = L.epe_rate(jnp.asarray(gt), jnp.asarray(disp_ref),
                            MAX_DISP, 3.0)
    assert float(e_fw) == pytest.approx(float(e_rf), abs=1e-3)
    assert float(r_fw) == pytest.approx(float(r_rf), abs=1e-4)
    assert out["avg_epe"] == pytest.approx(float(e_fw), abs=1e-4)
