"""Drill into block_3d_1: which conv is slow, decomposed vs native."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np

def timed_loop(make_fn, iters=30, warmup=2):
    def run(n):
        fn = make_fn(n)
        int(fn())
        best = float("inf")
        for _ in range(warmup):
            t0 = time.perf_counter(); int(fn()); best = min(best, time.perf_counter()-t0)
        return best
    t1 = run(1); tn = run(iters)
    return (tn - t1) / (iters - 1)

def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.models.layers import conv3d_ndhwc
    dt = jnp.bfloat16
    nprng = np.random.default_rng(0)

    def scan_time(apply, x, label):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx + c.astype(dt))
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return lambda: loop(x)
        print(f"{label:52s} {timed_loop(make)*1e3:8.2f} ms"); sys.stdout.flush()

    cases = [
        ("stride2 32->64 @[96,128,256] decomp", (1,96,128,256,32), (3,3,3,32,64), 2, True),
        ("stride2 32->64 @[96,128,256] native", (1,96,128,256,32), (3,3,3,32,64), 2, False),
        ("stride1 64->64 @[48,64,128] decomp", (1,48,64,128,64), (3,3,3,64,64), 1, True),
        ("stride1 64->64 @[48,64,128] native", (1,48,64,128,64), (3,3,3,64,64), 1, False),
    ]
    for label, xs, ks, st, dec in cases:
        x = jnp.asarray(nprng.standard_normal(xs), dt)
        k = jnp.asarray(nprng.standard_normal(ks), dt)
        scan_time(lambda a, k=k, st=st, dec=dec:
                  conv3d_ndhwc(a, k, st, 1, dt, decompose=dec).astype(dt), x, label)

if __name__ == "__main__":
    main()
