"""Colormap tests vs direct scalar re-implementations of the KITTI LUTs."""
import numpy as np

from msnets_tpu.utils.colormap import kt15_error_log_color, kt15_false_color


def _false_color_scalar(disp, max_disp=-1.0):
    """Literal loop translation of the official KITTI false-coloring
    (reference writeKT15FalseColor.pyx:27-82)."""
    cmap = np.array([[0, 0, 0, 114], [0, 0, 1, 185], [1, 0, 0, 114],
                     [1, 0, 1, 174], [0, 1, 0, 114], [0, 1, 1, 185],
                     [1, 1, 0, 114], [1, 1, 1, 0]], np.float32)
    s = cmap[:, 3].sum()
    weights = np.zeros(8, np.float32)
    cumsum = np.zeros(8, np.float32)
    for i in range(7):
        weights[i] = s / cmap[i, 3]
        cumsum[i + 1] = cumsum[i] + cmap[i, 3] / s
    h, w = disp.shape
    max_val = max_disp if max_disp > 0 else disp.max()
    out = np.zeros((h, w, 3), np.float32)
    for i in range(h):
        for j in range(w):
            val = min(max(disp[i, j] / max_val, 0.0), 1.0)
            for k in range(7):
                if val < cumsum[k + 1]:
                    break
            tw = 1.0 - (val - cumsum[k]) * weights[k]
            out[i, j] = (tw * cmap[k, :3] + (1 - tw) * cmap[k + 1, :3]) * 255.0
    return out


def test_false_color_matches_scalar():
    rng = np.random.default_rng(0)
    disp = (rng.random((20, 30)) * 192).astype(np.float32)
    ref = _false_color_scalar(disp)
    got = kt15_false_color(disp)
    np.testing.assert_allclose(ref, got, atol=1e-3)


def test_false_color_fixed_maxdisp():
    disp = np.linspace(0, 100, 64, dtype=np.float32).reshape(8, 8)
    ref = _false_color_scalar(disp, 256.0)
    got = kt15_false_color(disp, 256.0)
    np.testing.assert_allclose(ref, got, atol=1e-3)


def test_error_log_color_bins():
    gt = np.full((6, 8), 10.0, np.float32)
    pred = gt.copy()
    pred[2, 3] += 100.0          # huge error -> last bin color (165, 0, 38)
    pred[3, 4] += 0.01           # tiny error -> first bin (49, 54, 149)
    out = kt15_error_log_color(pred, gt)
    np.testing.assert_array_equal(out[2, 3], [165, 0, 38])
    np.testing.assert_array_equal(out[3, 4], [49, 54, 149])
    # borders always zero; invalid gt pixels zero
    assert (out[0, :] == 0).all() and (out[:, 0] == 0).all()
    gt2 = gt.copy()
    gt2[3, 3] = 0.0
    out2 = kt15_error_log_color(pred, gt2)
    assert (out2[3, 3] == 0).all()
