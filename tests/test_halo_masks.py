"""Unit tests pinning the iota-mask halo zeroing to scatter semantics.

`zero_shift_halo` / `zero_w_halo` were rewritten in round 5 from
``.at[].set(0)`` (which lowers to full-buffer dynamic-update-slice chains
in fwd AND VJP — ~10 GB/step of the train step's optimized HLO, PERF.md)
to fused `jnp.where` selects. The packed-conv equivalence suites cover
them indirectly; these tests pin the exact element sets directly so a
future mask-algebra change fails loudly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msnets_tpu.models.layers import zero_shift_halo, zero_w_halo


@pytest.mark.parametrize("shape,C", [((2, 3, 5, 7, 16), 4),
                                     ((1, 2, 2, 2, 8), 2),
                                     ((1, 4, 9, 6, 32), 8)])
def test_zero_shift_halo_matches_scatter(shape, C):
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ref = np.asarray(y).copy()
    ref[:, :, 0, :, :2 * C] = 0          # row -1  (ph = 0)
    ref[:, :, -1, :, 2 * C:] = 0         # row H   (ph = 1)
    ref[:, :, :, 0, :C] = 0              # col -1  (pw = 0)
    ref[:, :, :, 0, 2 * C:3 * C] = 0
    ref[:, :, :, -1, C:2 * C] = 0        # col W   (pw = 1)
    ref[:, :, :, -1, 3 * C:] = 0
    np.testing.assert_array_equal(np.asarray(zero_shift_halo(y)), ref)


def test_zero_w_halo_matches_scatter():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(2, 3, 5, 7, 10)), jnp.float32)
    C = 5
    ref = np.asarray(y).copy()
    ref[:, :, :, 0, :C] = 0
    ref[:, :, :, -1, C:] = 0
    np.testing.assert_array_equal(np.asarray(zero_w_halo(y)), ref)


def test_halo_mask_grads_zero_on_halo():
    """VJP must kill cotangents exactly on halo positions and pass others
    through untouched (the old scatter form's gradient semantics)."""
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(size=(1, 2, 4, 5, 8)), jnp.float32)
    g = jnp.asarray(rng.normal(size=y.shape), jnp.float32)
    _, vjp = jax.vjp(zero_shift_halo, y)
    (dy,) = vjp(g)
    mask = np.asarray(zero_shift_halo(jnp.ones_like(y)))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(g) * mask)
