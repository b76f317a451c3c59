"""deconv3 lowering shootout at its exact eval shape.

deconv3 (eval): ConvTranspose3d 64->64, k=3, s=2, [1,24,32,64,64] ->
[1,48,64,128,64], + skip add (res_l23) + ReLU. The dense lhs_dilation
lowering reads 2.27 ms in the integrated prefix profile — 8x deconv2's
0.31 ms for 8x the work, so it scales linearly but sits ~4x above the
sparse-FLOP floor (~11 GFLOP). Candidates: conv_shuffle (one 2^3 packed
conv, contraction 8cin, N=8cout, + depth-to-space interleave of the
25 MB bf16 output) and subpixel phases.
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
    from msnets_tpu.models.layers import (deconv3d_apply, deconv3d_subpixel,
                                          deconv3d_conv_shuffle)
    nprng = np.random.default_rng(0)
    dt = jnp.bfloat16

    x = jnp.asarray(nprng.standard_normal((1, 24, 32, 64, 64)), dt)
    skip = jnp.asarray(nprng.standard_normal((1, 48, 64, 128, 64)), dt)
    k3 = jnp.asarray(nprng.standard_normal((3, 3, 3, 64, 64)) * 0.02, dt)

    def scan_time(apply, label):
        def make(n):
            @jax.jit
            def loop(args):
                xx, sk = args
                def body(c, _):
                    out = apply(xx + c.astype(xx.dtype), sk)
                    o = out.ravel()
                    return jax.lax.dynamic_index_in_dim(
                        o, c % o.size, 0, False).astype(
                            jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                    length=n)
                return c
            return lambda: loop((x, skip))
        print(f"{label:34s} {timed_loop(make)*1e3:8.2f} ms"); sys.stdout.flush()

    from msnets_tpu.models.layers import deconv3d_ps_shuffle
    scan_time(lambda a, sk: jax.nn.relu(
        deconv3d_apply(a, k3, 2, dt, "dense") + sk), "dense + skip + relu")
    scan_time(lambda a, sk: jax.nn.relu(
        deconv3d_conv_shuffle(a, k3, dt) + sk), "conv_shuffle + skip + relu")
    scan_time(lambda a, sk: jax.nn.relu(
        deconv3d_ps_shuffle(a, k3, dt) + sk), "ps_shuffle + skip + relu")
    scan_time(lambda a, sk: jax.nn.relu(
        deconv3d_subpixel(a, k3, 2, dt).astype(dt) + sk),
        "subpixel + skip + relu")

    # deconv2 shape for reference: [1,12,16,32,64] -> [1,24,32,64,64]
    x2 = jnp.asarray(nprng.standard_normal((1, 12, 16, 32, 64)), dt)
    sk2 = jnp.asarray(nprng.standard_normal((1, 24, 32, 64, 64)), dt)

    def scan_time2(apply, label):
        def make(n):
            @jax.jit
            def loop(args):
                xx, sk = args
                def body(c, _):
                    out = apply(xx + c.astype(xx.dtype), sk)
                    o = out.ravel()
                    return jax.lax.dynamic_index_in_dim(
                        o, c % o.size, 0, False).astype(
                            jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                    length=n)
                return c
            return lambda: loop((x2, sk2))
        print(f"{label:34s} {timed_loop(make)*1e3:8.2f} ms"); sys.stdout.flush()

    scan_time2(lambda a, sk: jax.nn.relu(
        deconv3d_apply(a, k3, 2, dt, "dense") + sk), "d2 dense + skip + relu")
    scan_time2(lambda a, sk: jax.nn.relu(
        deconv3d_conv_shuffle(a, k3, dt) + sk), "d2 conv_shuffle + skip + relu")


if __name__ == "__main__":
    main()
