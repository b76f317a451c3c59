"""Pallas kernel tests (interpreter mode on CPU; compiled path is exercised
on real TPU hardware by the benchmark)."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from msnets_tpu.ops import matchers as M
from msnets_tpu.ops import oracle_np as O
from msnets_tpu.ops.pallas.census_aml_pallas import census_aml_pallas
from msnets_tpu.ops.pallas.census_pallas import census_pallas


@pytest.mark.parametrize("shape,wsize,ndisp,tile", [
    ((20, 40), 5, 8, 4),
    ((24, 33), 5, 12, 8),   # non-divisible rows -> padding path
    ((30, 64), 11, 16, 8),
])
def test_census_pallas_matches_oracle(shape, wsize, ndisp, tile):
    rng = np.random.default_rng(0)
    iml = rng.integers(0, 256, shape, dtype=np.uint8)
    imr = rng.integers(0, 256, shape, dtype=np.uint8)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(census_pallas(jnp.asarray(iml), jnp.asarray(imr),
                                       ndisp, wsize, tile))
    ref = O.census(iml, imr, ndisp, wsize)
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("shape,ndisp,tile,sigma", [
    ((20, 40), 8, 4, 128.0),
    ((24, 33), 12, 8, 128.0),   # non-divisible rows -> padding path
    ((30, 64), 16, 8, 64.0),
])
def test_census_aml_pallas_matches_xla(shape, ndisp, tile, sigma):
    """The fused census+AML kernel must equal the XLA formulation's two
    channels exactly (same masking/sentinel semantics)."""
    rng = np.random.default_rng(1)
    iml = rng.integers(0, 256, shape, dtype=np.uint8)
    imr = rng.integers(0, 256, shape, dtype=np.uint8)
    cost, aml = census_aml_pallas(jnp.asarray(iml), jnp.asarray(imr),
                                  ndisp, 11, sigma, tile, True)
    ref_c = M.census(jnp.asarray(iml), jnp.asarray(imr), ndisp, 11)
    ref_cost = np.clip(np.asarray(ref_c), 0, 120) / 120.0
    ref_aml = np.asarray(M.extract_aml(ref_c, sigma))
    np.testing.assert_allclose(np.asarray(cost), ref_cost, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aml), ref_aml, atol=1e-6)


def test_census_aml_pallas_all_invalid_rows():
    """Images narrower than the window -> all-sentinel cost, zero AML."""
    iml = np.full((12, 8), 7, np.uint8)   # W=8 < censw=11
    imr = np.full((12, 8), 9, np.uint8)
    cost, aml = census_aml_pallas(jnp.asarray(iml), jnp.asarray(imr),
                                  4, 11, 128.0, 4, True)
    np.testing.assert_array_equal(np.asarray(aml), 0.0)
    np.testing.assert_array_equal(np.asarray(cost), 1.0)  # clip(INVALID)/120
