"""Packed decoder tail timings at bench shapes.

deconv3d_s2_packed_out ([1,48,64,128,64] -> [1,48,64,128,256]), the packed
head, d_split_pack of the skip, and the skip-add+relu.
"""
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
    from msnets_tpu.models.layers import (SubpixelSoftArgminHead,
                                          d_split_pack,
                                          deconv3d_s2_packed_out)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 48, 64, 128, 64)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64, 32)) * 0.1, dt)
    xp3 = jnp.asarray(rng.standard_normal((1, 48, 64, 128, 256)), dt)
    skip_std = jnp.asarray(rng.standard_normal((1, 96, 64, 128, 128)), dt)

    head = SubpixelSoftArgminHead(stride=2, dtype=dt)
    vh = head.init(jax.random.PRNGKey(0), xp3, True)

    def scan_time(apply, inp, label):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx + c.astype(xx.dtype))
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return lambda: loop(inp)
        try:
            d = timed_loop(make)
            print(f"{label:48s} {d*1e3:8.2f} ms")
        except Exception as e:
            print(f"{label:48s} FAILED: {str(e)[:110]}")
        sys.stdout.flush()

    scan_time(lambda a: deconv3d_s2_packed_out(a, k, dt), x,
              "deconvbn4 packed conv (2x 2D decomp)")
    scan_time(lambda a: head.apply(vh, a, True), xp3, "packed head")
    scan_time(d_split_pack, skip_std, "d_split_pack skip (96->48 D-fold)")
    scan_time(lambda a: jax.nn.relu(a + d_split_pack(skip_std)), xp3,
              "skip-add + relu (fused)")


if __name__ == "__main__":
    main()
