"""C++ host oracle vs NumPy oracle parity.

Auto-builds the .so (``make -C cpp``, ~1 s) when it is missing so a fresh
checkout never silently skips; skips only if the native toolchain itself
is unavailable."""
import os
import subprocess

import numpy as np
import pytest

from msnets_tpu.ops import oracle_np as O

ocpp = pytest.importorskip("msnets_tpu.ops.oracle_cpp")
if not ocpp.available():
    cpp_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cpp")
    _build_err = ""
    try:
        _proc = subprocess.run(["make", "-C", cpp_dir], capture_output=True,
                               text=True)
        if _proc.returncode != 0:
            _build_err = (_proc.stderr or _proc.stdout or "")[-500:]
    except OSError as e:  # `make` itself missing: fall through to the skip
        _build_err = str(e)
if not ocpp.available():
    pytest.skip("cpp/libmsnets_oracle.so not built and `make -C cpp` failed: "
                + _build_err, allow_module_level=True)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(9)
    return (rng.integers(0, 256, (36, 60), dtype=np.uint8),
            rng.integers(0, 256, (36, 60), dtype=np.uint8))


def _cmp(a, b, tol):
    m = a < 1e9
    assert np.array_equal(m, b < 1e9), "sentinel pattern mismatch"
    np.testing.assert_allclose(a[m], b[m], atol=tol)


def test_census(pair):
    iml, imr = pair
    _cmp(O.census(iml, imr, 12, 11), ocpp.census(iml, imr, 12, 11), 0)


def test_sobel(pair):
    np.testing.assert_array_equal(O.sobel(pair[0]), ocpp.sobel(pair[0]))


def test_ncc(pair):
    iml, imr = pair
    _cmp(O.swap_axes(O.ncc_nister(iml, imr, 12, 3)),
         ocpp.ncc_nister(iml, imr, 12, 3), 1e-6)


def test_zsad(pair):
    iml, imr = pair
    _cmp(O.swap_axes(O.zsad(iml, imr, 12, 5)), ocpp.zsad(iml, imr, 12, 5), 2e-3)


def test_sadsob(pair):
    sl, sr = O.sobel(pair[0]), O.sobel(pair[1])
    _cmp(O.swap_axes(O.sadsob(sl, sr, 12, 5)), ocpp.sadsob(sl, sr, 12, 5), 1e-3)


def test_aml_pkrn():
    rng = np.random.default_rng(3)
    vol = np.where(rng.random((80, 12)) < 0.1, O.INVALID,
                   rng.random((80, 12)) * 50).astype(np.float32)
    vol[0] = O.INVALID
    np.testing.assert_allclose(O.extract_aml(vol, 128.0),
                               ocpp.extract_aml(vol, 128.0), atol=1e-6)
    np.testing.assert_allclose(O.extract_pkrn(vol, 1.0),
                               ocpp.extract_pkrn(vol, 1.0), atol=1e-6)


def test_view_reindex():
    rng = np.random.default_rng(4)
    c = (rng.random((10, 20, 6)) * 9).astype(np.float32)
    np.testing.assert_array_equal(O.get_right_cost(c), ocpp.get_right_cost(c))
    np.testing.assert_array_equal(O.get_left_cost(c), ocpp.get_left_cost(c))


def test_full_feature_pipeline(pair):
    iml, imr = pair
    ref = O.extract_features_left(*O.get_costs(iml, imr, 12, 11, 3, 5, 5, 5, 6, 0))
    got = ocpp.extract_features_left(*ocpp.get_costs(iml, imr, 12, 11, 3, 5, 5, 5, 6, 0))
    np.testing.assert_allclose(ref, got, atol=1e-5)
