"""Golden-value tests: JAX matcher ops vs the NumPy oracle.

The oracle (msnets_tpu/ops/oracle_np.py) replicates the reference C++ kernel
semantics (reference: src/cpp/matchers/matchers.cpp,
src/cpp/featextract/featextract.cpp) including sentinel fills and
valid-region quirks; see its docstring.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from msnets_tpu.config import INVALID
from msnets_tpu.ops import matchers as M
from msnets_tpu.ops import oracle_np as O


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(42)
    H, W = 28, 52
    iml = rng.integers(0, 256, (H, W), dtype=np.uint8)
    imr = rng.integers(0, 256, (H, W), dtype=np.uint8)
    return iml, imr


@pytest.mark.parametrize("wsize", [5, 11])
@pytest.mark.parametrize("ndisp", [1, 12])
def test_census_golden(pair, wsize, ndisp):
    iml, imr = pair
    ref = O.census(iml, imr, ndisp, wsize)
    got = np.asarray(M.census(jnp.asarray(iml), jnp.asarray(imr), ndisp, wsize))
    np.testing.assert_array_equal(ref, got)


def test_census_range(pair):
    iml, imr = pair
    c = np.asarray(M.census(jnp.asarray(iml), jnp.asarray(imr), 8, 11))
    valid = c < 1e9
    assert c[valid].min() >= 0 and c[valid].max() <= 121


def test_sobel_golden(pair):
    iml, _ = pair
    np.testing.assert_array_equal(O.sobel(iml), np.asarray(M.sobel(jnp.asarray(iml))))


@pytest.mark.parametrize("ndisp", [1, 12])
def test_ncc_golden(pair, ndisp):
    iml, imr = pair
    ref = O.swap_axes(O.ncc_nister(iml, imr, ndisp, 3))
    got = np.asarray(M.ncc_nister(jnp.asarray(iml), jnp.asarray(imr), ndisp, 3))
    mask = ref < 1e9
    assert np.array_equal(mask, got < 1e9), "sentinel pattern mismatch"
    np.testing.assert_allclose(ref[mask], got[mask], atol=3e-6)


def test_ncc_flat_window_is_one():
    # constant image -> zero variance -> non-finite normalizer -> cost 1
    iml = np.full((16, 24), 7, dtype=np.uint8)
    imr = np.full((16, 24), 7, dtype=np.uint8)
    got = np.asarray(M.ncc_nister(jnp.asarray(iml), jnp.asarray(imr), 4, 3))
    valid = got < 1e9
    assert valid.any()
    np.testing.assert_array_equal(got[valid], 1.0)
    ref = O.swap_axes(O.ncc_nister(iml, imr, 4, 3))
    np.testing.assert_array_equal(ref, got)


def test_zsad_golden(pair):
    iml, imr = pair
    ref = O.swap_axes(O.zsad(iml, imr, 10, 5))
    got = np.asarray(M.zsad(jnp.asarray(iml), jnp.asarray(imr), 10, 5))
    mask = ref < 1e9
    assert np.array_equal(mask, got < 1e9)
    np.testing.assert_allclose(ref[mask], got[mask], atol=5e-3)


def test_sadsob_golden(pair):
    iml, imr = pair
    sl, sr = O.sobel(iml), O.sobel(imr)
    ref = O.swap_axes(O.sadsob(sl, sr, 10, 5))
    got = np.asarray(M.sadsob(jnp.asarray(sl), jnp.asarray(sr), 10, 5))
    mask = ref < 1e9
    assert np.array_equal(mask, got < 1e9)
    np.testing.assert_allclose(ref[mask], got[mask], atol=5e-3)


def test_disparity_validity_rule(pair):
    """Costs exist only for d <= col - wc (matchers.cpp:318 and j=d loops)."""
    iml, imr = pair
    for w, vol in [
        (11, np.asarray(M.census(jnp.asarray(iml), jnp.asarray(imr), 12, 11))),
        (3, np.asarray(M.ncc_nister(jnp.asarray(iml), jnp.asarray(imr), 12, 3))),
    ]:
        wc = w // 2
        H, W, D = vol.shape
        for d in range(D):
            col = vol[:, : min(wc + d, W), d]
            assert (col >= 1e9).all(), f"w={w} d={d}: invalid band should be sentinel"


def test_aml_golden():
    rng = np.random.default_rng(3)
    vol = (rng.random((64, 16)) * 100).astype(np.float32)
    vol[rng.random((64, 16)) < 0.15] = INVALID
    vol[0, :] = INVALID  # fully-invalid row -> all zeros
    ref = O.extract_aml(vol, 128.0)
    got = np.asarray(M.extract_aml(jnp.asarray(vol), 128.0))
    np.testing.assert_allclose(ref, got, atol=1e-6)
    assert (got[0] == 0).all()
    # valid rows are a probability distribution
    s = got[1:].sum(-1)
    np.testing.assert_allclose(s[s > 0], 1.0, atol=1e-5)


def test_pkrn_golden():
    rng = np.random.default_rng(4)
    vol = (rng.random((32, 8)) * 50).astype(np.float32)
    vol[0, :] = INVALID
    ref = O.extract_pkrn(vol, 1.0)
    got = np.asarray(M.extract_pkrn(jnp.asarray(vol), 1.0))
    np.testing.assert_allclose(ref, got, atol=1e-6)


def test_right_left_cost_roundtrip():
    rng = np.random.default_rng(5)
    c = (rng.random((12, 20, 6)) * 10).astype(np.float32)
    r_ref = O.get_right_cost(c)
    r_got = np.asarray(M.get_right_cost(jnp.asarray(c)))
    np.testing.assert_array_equal(r_ref, r_got)
    l_ref = O.get_left_cost(c)
    l_got = np.asarray(M.get_left_cost(jnp.asarray(c)))
    np.testing.assert_array_equal(l_ref, l_got)
    # re-indexing identity: L[i,j,d] = R[i,j-d,d] = Lorig[i,j,d] where defined
    back = np.asarray(M.get_left_cost(jnp.asarray(r_ref)))
    D = c.shape[2]
    for d in range(D):
        np.testing.assert_array_equal(back[:, d:20 - d + 0, d][:, : 20 - d - d if 20 - 2 * d > 0 else 0],
                                      c[:, d:20 - d, d][:, : max(20 - 2 * d, 0)])


def test_batched_vmap(pair):
    import jax
    iml, imr = pair
    b_l = jnp.stack([jnp.asarray(iml)] * 2)
    b_r = jnp.stack([jnp.asarray(imr)] * 2)
    out = jax.vmap(lambda a, b: M.census(a, b, 6, 5))(b_l, b_r)
    single = M.census(jnp.asarray(iml), jnp.asarray(imr), 6, 5)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(single))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(single))


def test_image_smaller_than_census_window_all_sentinel():
    """8x8 images vs censw=11: every entry must be the INVALID sentinel
    (no crash, no NaN) — matches the reference's border semantics."""
    rng = np.random.default_rng(1)
    iml = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    imr = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    c = np.asarray(M.census(jnp.asarray(iml), jnp.asarray(imr), 4, 11))
    assert np.all(c == INVALID)
    assert np.all(np.isfinite(c))


def test_ndisp_wider_than_image():
    """ndisp > image width: the validity band d <= col - wc leaves the
    out-of-range disparities at the sentinel; finite everywhere."""
    rng = np.random.default_rng(2)
    iml = rng.integers(0, 256, (24, 20), dtype=np.uint8)
    imr = rng.integers(0, 256, (24, 20), dtype=np.uint8)
    for fn, args in ((M.census, (32, 5)), (M.ncc_nister, (32, 3)),
                     (M.zsad, (32, 5)), (M.sadsob, (32, 5))):
        c = np.asarray(fn(jnp.asarray(iml), jnp.asarray(imr), *args))
        assert np.all(np.isfinite(c)), fn
        wc = args[1] // 2
        # disparities that no column can reach stay fully invalid
        assert np.all(c[..., 19 - wc + 1:] == INVALID), fn


def test_flat_images_all_matchers_finite():
    """Zero-texture images: NCC's degenerate variance path and every other
    matcher must stay finite (verify-skill probe)."""
    iml = np.full((20, 30), 128, np.uint8)
    imr = np.full((20, 30), 128, np.uint8)
    for fn, args in ((M.census, (8, 5)), (M.ncc_nister, (8, 3)),
                     (M.zsad, (8, 5)), (M.sadsob, (8, 5))):
        c = np.asarray(fn(jnp.asarray(iml), jnp.asarray(imr), *args))
        assert np.all(np.isfinite(c)), fn
