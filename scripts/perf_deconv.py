"""Isolated deconv timing: XLA dense (lhs_dilation) vs subpixel phases."""
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
            t0 = time.perf_counter(); int(fn()); best = min(best, time.perf_counter() - t0)
        return best
    t1 = run(1); tn = run(iters)
    return (tn - t1) / (iters - 1)

def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.models.layers import deconv3d_subpixel
    nprng = np.random.default_rng(0)

    def scan_time(apply, x, label):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx + c.astype(xx.dtype))
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return lambda: loop(x)
        dt = timed_loop(make)
        print(f"{label:46s} {dt*1e3:8.2f} ms"); sys.stdout.flush()

    for (d, h, w, cin, cout) in [(48, 64, 128, 64, 64), (96, 128, 256, 32, 1)]:
        dt_ = jnp.bfloat16
        x = jnp.asarray(nprng.standard_normal((1, d, h, w, cin)), dt_)
        k3 = jnp.asarray(nprng.standard_normal((3, 3, 3, cin, cout)), dt_)

        def dense(a, k3=k3):
            dn = jax.lax.conv_dimension_numbers(a.shape, k3.shape, ("NDHWC", "DHWIO", "NDHWC"))
            return jax.lax.conv_general_dilated(a, k3, (1, 1, 1), [(1, 2)] * 3,
                lhs_dilation=(2, 2, 2), dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(dt_)

        def subpix(a, k3=k3):
            return deconv3d_subpixel(a, k3, 2, dt_).astype(dt_)

        scan_time(dense, x, f"deconv dense {cin}->{cout} [{d},{h},{w}]")
        scan_time(subpix, x, f"deconv subpix {cin}->{cout} [{d},{h},{w}]")

if __name__ == "__main__":
    main()
