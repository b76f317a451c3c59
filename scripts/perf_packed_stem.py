"""Packed-stem piece timings at bench shapes ([1,96,128,256] volume).

Pieces: hw_pack, conv1 packed (8->32, std->shift), conv2 packed (32->32,
shift->std), hw_unpack, stride-2 conv from packed input; unpacked
counterparts for reference.
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
    from msnets_tpu.models.layers import (conv3d_ndhwc, conv3d_s1_hw_packed,
                                          conv3d_s2_hw_s2d, hw_pack,
                                          hw_unpack, zero_shift_halo)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    N, D, H, W = 1, 96, 128, 256
    x8 = jnp.asarray(rng.standard_normal((N, D, H, W, 8)), dt)
    xp8 = jnp.asarray(rng.standard_normal((N, D, H // 2, W // 2, 32)), dt)
    xps = jnp.asarray(rng.standard_normal((N, D, H // 2 + 1, W // 2 + 1, 128)), dt)
    xp32 = jnp.asarray(rng.standard_normal((N, D, H // 2, W // 2, 128)), dt)
    x32 = jnp.asarray(rng.standard_normal((N, D, H, W, 32)), dt)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 32)) * 0.1, dt)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, dt)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 64)) * 0.1, dt)

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
            print(f"{label:48s} FAILED: {str(e)[:100]}")
        sys.stdout.flush()

    scan_time(lambda a: hw_pack(a), x8, "hw_pack 8ch")
    scan_time(lambda a: conv3d_s1_hw_packed(a, k1, dt, True), xp8,
              "conv1 packed 8->32 std->shift")
    scan_time(lambda a: zero_shift_halo(jax.nn.relu(
        conv3d_s1_hw_packed(a, k1, dt, True))), xp8,
              "conv1 packed + relu + halo-zero")
    scan_time(lambda a: conv3d_s1_hw_packed(a, k2, dt, False), xps,
              "conv2 packed 32->32 shift->std")
    scan_time(lambda a: hw_unpack(a), xp32, "hw_unpack 32ch")
    scan_time(lambda a: conv3d_s2_hw_s2d(a, k3, dt, packed_input=True), xp32,
              "s2 conv 32->64 from packed")
    scan_time(lambda a: conv3d_ndhwc(a, k1, 1, 1, dt), x8,
              "conv1 unpacked (reference)")
    scan_time(lambda a: conv3d_ndhwc(a, k2, 1, 1, dt), x32,
              "conv2 unpacked (reference)")


if __name__ == "__main__":
    main()
