"""Loss/metric tests: torch parity + the reference's hand-written gradient."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msnets_tpu.engine import loss as L

torch = pytest.importorskip("torch")


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    pred = (rng.random((4, 16, 16)) * 40).astype(np.float32)
    gt = (rng.random((4, 16, 16)) * 40).astype(np.float32)
    gt[rng.random(gt.shape) < 0.2] = 0.0       # invalid pixels
    return pred, gt


def test_smooth_l1_matches_torch(data):
    pred, gt = data
    mask = np.asarray(L.train_valid_mask(jnp.asarray(gt), 192))
    ref = torch.nn.functional.smooth_l1_loss(
        torch.tensor(pred)[torch.tensor(mask)],
        torch.tensor(gt)[torch.tensor(mask)], reduction="mean").item()
    got = float(L.smooth_l1(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert abs(ref - got) < 1e-6


def test_my_loss2_forward_piecewise(data):
    """Forward == the reference MyLoss2Function.forward math (loss.py:26-36)."""
    pred, gt = data
    mask = np.ones_like(gt, bool)
    thresh, alpha = 3.0, 2.0
    t = np.abs(pred - gt).astype(np.float64)
    ref = t.copy()
    lo = t < thresh
    ref[lo] = t[lo] ** 2 / thresh
    mid = (t >= thresh) & (t <= thresh + alpha)
    ref[mid] = t[mid] * 2 - (t[mid] - thresh) ** 2 / (2 * alpha) - thresh
    ref[t > thresh + alpha] += alpha / 2
    got = float(L.my_loss2(jnp.asarray(pred), jnp.asarray(gt),
                           jnp.asarray(mask), thresh, alpha))
    assert abs(ref.mean() - got) < 1e-4  # float32 vs float64 accumulation


def test_my_loss2_gradient_matches_reference_backward(data):
    """The reference writes its backward by hand (loss.py:38-50):
    scale = 2t/thresh (t<thresh), 2-(t-thresh)/alpha (mid), 1 (high);
    grad = sign(diff) * scale / numel. Autodiff must reproduce it."""
    pred, gt = data
    mask = np.ones_like(gt, bool)
    thresh, alpha = 3.0, 2.0
    g = jax.grad(lambda p: L.my_loss2(p, jnp.asarray(gt), jnp.asarray(mask),
                                      thresh, alpha))(jnp.asarray(pred))
    diff = pred - gt
    t = np.abs(diff)
    scale = np.ones_like(t)
    mid = (t >= thresh) & (t <= thresh + alpha)
    scale[mid] = 2 - (t[mid] - thresh) / alpha
    lo = t < thresh
    scale[lo] = 2 * t[lo] / thresh
    ref = np.sign(diff) * scale / t.size
    np.testing.assert_allclose(np.asarray(g), ref, atol=1e-6)


def test_masks():
    gt = jnp.asarray([0.0, 0.0005, 0.001, 5.0, 191.9, 192.0, 200.0])
    train = np.asarray(L.train_valid_mask(gt, 192))
    np.testing.assert_array_equal(
        train, [False, True, True, True, True, False, False])
    ev = np.asarray(L.eval_valid_mask(gt, 192))
    np.testing.assert_array_equal(
        ev, [False, False, True, True, True, True, False])


def test_epe_rate_matches_reference_numpy(data):
    """get_epe_rate parity (main_msnet.py:708-713)."""
    pred, gt = data
    mask = np.logical_and(gt >= 0.001, gt <= 192)
    ref_epe = np.mean(np.abs(pred[mask] - gt[mask]))
    ref_rate = np.sum(np.abs(pred[mask] - gt[mask]) > 3.0) / np.sum(mask)
    e, r = L.epe_rate(jnp.asarray(gt), jnp.asarray(pred), 192, 3.0)
    assert abs(float(e) - ref_epe) < 1e-5
    assert abs(float(r) - ref_rate) < 1e-6


def test_accu3(data):
    pred, gt = data
    mask = np.asarray(L.train_valid_mask(jnp.asarray(gt), 192))
    ref = np.mean(np.abs(gt[mask] - pred[mask]) <= 3.0)
    got = float(L.valid_accu3(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)))
    assert abs(ref - got) < 1e-6


def test_psmnet_loss_weighting(data):
    pred, gt = data
    mask = jnp.asarray(L.train_valid_mask(jnp.asarray(gt), 192))
    p = jnp.asarray(pred)
    g = jnp.asarray(gt)
    total = L.psmnet_loss(p, p, p, g, mask, is_kitti=False)
    single = L.smooth_l1(p, g, mask)
    np.testing.assert_allclose(float(total), float(single) * 1.8, rtol=1e-6)
