"""True prefix timings of the real MS-PSMNet eval graph at bench shapes
(VERDICT r4 item 3: give MS-PSMNet eval the GCNet stage-budget treatment).

Uses MSPSMNet's stop_at debug hook so each prefix is exactly the graph the
bench runs (same layouts/fusions). Differences of consecutive rows give
per-stage costs as XLA actually schedules them.

Usage: python scripts/perf_psmnet_prefix.py [H W]   (default 128 256 at
half-res volume scale = bench 256x512 full-res)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np


def timed_loop(make_fn, iters=20, warmup=2):
    def run(n):
        fn = make_fn(n)
        int(fn())
        best = float("inf")
        for _ in range(warmup):
            t0 = time.perf_counter(); int(fn()); best = min(best, time.perf_counter() - t0)
        return best
    t1 = run(1); tn = run(iters)
    return (tn - t1) / (iters - 1)


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.models.psmnet import MSPSMNet

    Hh = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    Wh = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    cv = jnp.asarray(rng.standard_normal((1, 96, Hh, Wh, 8)), dt)
    model = MSPSMNet(max_disp=192, dtype=dt)
    v = jax.jit(lambda k: model.init(k, jnp.zeros((1, 96, 16, 16, 8), dt),
                                     False))(jax.random.PRNGKey(0))

    prev = 0.0
    for name in ("dres1", "hg1", "hg2", "hg3", "classif", ""):
        def make(n, name=name):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = model.apply(v, xx + c.astype(xx.dtype), False,
                                      stop_at=name)
                    o = out.ravel()
                    return jax.lax.dynamic_index_in_dim(
                        o, c % o.size, 0, False).astype(
                            jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                    length=n)
                return c
            return lambda: loop(cv)
        try:
            d = timed_loop(make) * 1e3
            print(f"{name or 'FULL':10s} cum {d:7.2f} ms   stage {d-prev:+7.2f} ms")
            prev = d
        except Exception as e:
            print(f"{name or 'FULL':10s} FAILED: {str(e)[:110]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
