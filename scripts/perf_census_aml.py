"""Fused census+AML Pallas kernel vs the XLA formulation, on real TPU.

Shapes = the bench feature stage (512x256 pair -> half res + 10-px border:
148 x 276, D = 96). Both paths produce the two census feature channels
(clip/120 and AML).

Usage: python scripts/perf_census_aml.py [row_tile ...]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np

H, W, D = 148, 276, 96


def timed(fn, iters=20):
    import jax, jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(a, b):
            def body(c, _):
                cost, aml = fn(a ^ (c % 2).astype(jnp.uint8), b)
                return (cost[0, 0, 0] + aml[0, 0, 0]).astype(jnp.int32) % 2, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
            return c
        return loop

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    def run(n):
        lp = make(n)
        int(lp(a, b))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(lp(a, b))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tn = run(1), run(iters)
    return (tn - t1) / (iters - 1) * 1e3


def main():
    import jax.numpy as jnp
    from msnets_tpu.ops import matchers as M
    from msnets_tpu.ops.pallas.census_aml_pallas import census_aml_pallas

    def xla_path(a, b):
        c = M.census(a, b, D, 11)
        return jnp.clip(c, 0.0, 120.0) / 120.0, M.extract_aml(c, 128.0)

    ms = timed(xla_path)
    print(f"XLA census+clip+AML : {ms:7.3f} ms")
    sys.stdout.flush()
    for tile in [int(t) for t in sys.argv[1:]] or [8, 16, 32]:
        try:
            ms = timed(lambda a, b: census_aml_pallas(a, b, D, 11, 128.0,
                                                      tile))
            print(f"pallas fused tile={tile:3d}: {ms:7.3f} ms")
        except Exception as e:
            print(f"pallas fused tile={tile:3d}: FAILED {str(e)[:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
