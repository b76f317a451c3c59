"""Pallas kernel tests (interpreter mode on CPU; compiled path is exercised
on real TPU hardware by the benchmark)."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from msnets_tpu.ops import oracle_np as O
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
