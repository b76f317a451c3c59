"""CBMV sampling utilities + debug-viz helpers."""
import numpy as np

from msnets_tpu.ops import sampling as S
from msnets_tpu.utils import debug_viz as V


def test_generate_d_indices_negatives_outside_band():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 65, 500)
    tri = S.generate_d_indices(gt, maxd=64, disp_thresh=4, rng=rng)
    assert tri.shape == (500, 3)
    np.testing.assert_array_equal(tri[:, 0], gt)
    for neg in (tri[:, 1], tri[:, 2]):
        assert (np.abs(neg - gt) > 4).all() or True  # at least one side holds:
    # each negative is outside [gt-thresh, gt+thresh]
    d1 = np.abs(tri[:, 1] - gt)
    d2 = np.abs(tri[:, 2] - gt)
    assert (d1 > 4).all() and (d2 > 4).all()
    assert (tri[:, 1] >= 0).all() and (tri[:, 1] <= 64).all()


def test_get_samples_and_labels():
    vol = np.arange(12, dtype=np.float32).reshape(3, 4)
    tri = np.array([[0, 1, 2], [3, 0, 1], [2, 3, 0]], np.int32)
    s = S.get_samples(vol, tri)
    np.testing.assert_array_equal(s, [0, 1, 2, 7, 4, 5, 10, 11, 8])
    labels = S.generate_labels(tri)
    np.testing.assert_array_equal(labels, [1, 0, 0] * 3)


def test_get_cost_slices_channel0():
    v = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    out = S.get_cost(v)
    np.testing.assert_array_equal(out, v[:, :, :, 0])


def test_feature_argmin_maps():
    rng = np.random.default_rng(1)
    feats = rng.random((8, 6, 10, 12)).astype(np.float32)
    maps = V.feature_argmin_maps(feats)
    assert set(maps) == set(V.FEATURE_NAMES)
    np.testing.assert_array_equal(maps["censusL"], feats[0].argmin(0))
    np.testing.assert_array_equal(maps["likly_cenL"], feats[4].argmax(0))


def test_show_grid_saves(tmp_path):
    p = str(tmp_path / "grid.png")
    V.show_image_grid([np.zeros((4, 4))] * 3, ["a", "b", "c"], save_path=p)
    import os
    assert os.path.getsize(p) > 0


def test_dataloader_len(tmp_path):
    f = tmp_path / "l.list"
    f.write_text("a\nb\nc\nd\ne\n")
    assert V.dataloader_len(str(f), 2) == 2


def test_generate_d_indices_fallback_negatives_independent():
    """When both negatives fall back to the same side (gt near 0 or maxd),
    they must still be INDEPENDENT draws (featextract.cpp calls rand()
    separately per negative) — a shared draw duplicates every low-gt
    pixel's negatives."""
    rng = np.random.default_rng(1)
    gt = np.zeros(400, np.int64)          # low side impossible: both go high
    tri = S.generate_d_indices(gt, maxd=64, disp_thresh=4, rng=rng)
    assert (tri[:, 1] >= 5).all() and (tri[:, 2] >= 5).all()
    frac_equal = (tri[:, 1] == tri[:, 2]).mean()
    assert frac_equal < 0.2, frac_equal   # ~1/59 if independent; 1.0 if shared
