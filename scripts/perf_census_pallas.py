"""Compile + validate + time census_pallas vs the XLA census on real TPU.

Usage: python scripts/perf_census_pallas.py [row_tile d_chunk]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from msnets_tpu.ops.matchers import census
from msnets_tpu.ops.pallas.census_pallas import census_pallas

H, W, D, WSIZE = 128, 256, 96, 11
row_tile = int(sys.argv[1]) if len(sys.argv) > 1 else 8
d_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def timed_scan(fn, iml, imr, iters):
    """On-device chained scan; subtract length-1 (see bench.py discipline)."""
    def make(n):
        @jax.jit
        def loop(a, b):
            def body(carry, _):
                x = a ^ carry.astype(jnp.uint8)
                out = fn(x, b)
                return (out[0, 0, 0] > 0).astype(jnp.int32) % 2, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
            return c
        return loop
    l1, ln = make(1), make(iters)
    int(l1(iml, imr)); int(ln(iml, imr))          # compile + sync
    t1 = min(_t(l1, iml, imr) for _ in range(3))
    tn = min(_t(ln, iml, imr) for _ in range(3))
    return (tn - t1) / (iters - 1)


def _t(fn, *args):
    t0 = time.perf_counter()
    int(fn(*args))
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    iml = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    print(f"[census_pallas] compiling row_tile={row_tile} d_chunk={d_chunk} "
          f"on {jax.devices()[0].platform} ...", flush=True)
    t0 = time.time()
    got = np.asarray(census_pallas(iml, imr, D, WSIZE, row_tile, d_chunk))
    print(f"  compiled+ran in {time.time()-t0:.0f}s", flush=True)
    ref = np.asarray(census(iml, imr, D, WSIZE))
    if np.array_equal(got, ref):
        print("  PARITY OK (bitwise equal to XLA census)")
    else:
        bad = np.sum(got != ref)
        print(f"  PARITY FAIL: {bad} mismatches"); return

    tp = timed_scan(lambda a, b: census_pallas(a, b, D, WSIZE, row_tile,
                                               d_chunk), iml, imr, 20)
    tx = timed_scan(lambda a, b: census(a, b, D, WSIZE), iml, imr, 20)
    print(f"  pallas {tp*1e3:.3f} ms   xla {tx*1e3:.3f} ms   "
          f"speedup {tx/tp:.2f}x")


if __name__ == "__main__":
    main()
