"""Losses and metrics.

Parity targets (reference: src/loss.py, main_msnet.py):
  * smooth-L1 with beta=1 (torch F.smooth_l1_loss, main_msnet.py:391)
  * ``MyLoss2`` — the GANet-style robust loss (loss.py:24-60). The reference
    implements the backward by hand, but its hand gradient IS the analytic
    derivative of the forward piecewise function (quadratic t^2/thresh below
    thresh -> 2t/thresh; taper 2t-(t-th)^2/(2a)-th -> 2-(t-th)/a; linear
    t+a/2 -> 1), so a plain differentiable implementation is exact. (The only
    divergence: the reference returns a zero gradient for the *target*
    argument; our target never requires gradients.)
  * valid masks: train  (gt - max_disp) * gt < 0     (main_msnet.py:382)
                 eval   0.001 <= gt <= max_disp      (main_msnet.py:708-713)
  * metrics: EPE, bad-tau rate, accu3 (loss.py:17-21)

All reductions are masked means computed as sum/count so they jit cleanly
with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, x, 0.0)) / cnt


def train_valid_mask(gt: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """0 < gt < max_disp (main_msnet.py:382)."""
    return (gt - max_disp) * gt < 0


def eval_valid_mask(gt: jnp.ndarray, max_disp: int) -> jnp.ndarray:
    """0.001 <= gt <= max_disp (main_msnet.py:709)."""
    return (gt >= 0.001) & (gt <= max_disp)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    elt = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    return masked_mean(elt, mask)


def my_loss2(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
             thresh: float = 3.0, alpha: float = 2.0) -> jnp.ndarray:
    """GANet robust loss (loss.py:26-36), masked mean.

    Deliberate divergence: the reference mutates ``temp`` in place, so
    mid-branch values that *become* > thresh+alpha also receive the final
    ``+= alpha/2`` (for thresh=3, alpha=2 this hits |err| in ~(4.17, 5]).
    Its hand-written backward ignores that, so gradients — the training
    spec — are identical to this clean piecewise form; only the reported
    loss scalar differs slightly.
    """
    t = jnp.abs(pred - target)
    low = t * t / thresh
    mid = t * 2.0 - (t - thresh) ** 2 / (2.0 * alpha) - thresh
    high = t + alpha / 2.0
    elt = jnp.where(t < thresh, low, jnp.where(t <= thresh + alpha, mid, high))
    return masked_mean(elt, mask)


def gcnet_loss(disp: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
               is_kitti: bool, thresh: float = 3.0, alpha: float = 2.0):
    """MS-GCNet loss (main_msnet.py:389-395)."""
    l0 = smooth_l1(disp, target, mask)
    if is_kitti:
        return 0.4 * l0 + 0.6 * my_loss2(disp, target, mask, thresh, alpha)
    return l0


def psmnet_loss(disp0, disp1, disp2, target, mask, is_kitti: bool,
                thresh: float = 3.0, alpha: float = 2.0):
    """MS-PSMNet 3-head loss 0.2/0.6/1.0 (main_msnet.py:396-405)."""
    l0 = smooth_l1(disp0, target, mask)
    l1 = smooth_l1(disp1, target, mask)
    if is_kitti:
        l2 = my_loss2(disp2, target, mask, thresh, alpha)
    else:
        l2 = smooth_l1(disp2, target, mask)
    return 0.2 * l0 + 0.6 * l1 + l2


def valid_accu3(target, pred, mask, thred: float = 3.0):
    """Fraction of valid pixels with |err| <= thred (loss.py:17-21)."""
    return masked_mean((jnp.abs(target - pred) <= thred).astype(jnp.float32), mask)


def epe(pred, target, mask):
    return masked_mean(jnp.abs(pred - target), mask)


def epe_rate(gt, pred, max_disp: int, threshold: float):
    """(EPE, bad-tau rate) on the eval mask (main_msnet.py:708-713)."""
    mask = eval_valid_mask(gt, max_disp)
    err = jnp.abs(pred - gt)
    e = masked_mean(err, mask)
    rate = masked_mean((err > threshold).astype(jnp.float32), mask)
    return e, rate
