"""int8 vs bf16 at the ACTUAL packed-lowering conv shapes of the eval graph.

perf_int8_conv.py probed k=3 full-layout shapes (2.6x); the integrated
quant_eval A/B LOST (24.1 vs 22.2 ms), so this probes the real packed
kernels: stem conv2's [2,2,128,128] (3 depth taps), conv1's [4,4,8,128]
stride-2, block1 entry's [2,2,128,64], and the wshift inner [3,2,128,128].
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np


def timed(make_fn, iters=30):
    def run(n):
        fn = make_fn(n)
        int(fn())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); int(fn()); best = min(best, time.perf_counter() - t0)
        return best
    t1, tn = run(1), run(iters)
    return (tn - t1) / (iters - 1)


def main():
    import jax, jax.numpy as jnp
    # (label, in shape [N,H,W,C], kernel [kh,kw,I,O], strides, pad)
    cases = [
        ("stem conv2 2x2x128->128 (1 tap)", (96, 65, 129, 128),
         (2, 2, 128, 128), (1, 1), [(0, 0), (0, 0)]),
        ("conv1 4x4x8->128 s2 (1 tap)", (96, 256, 512, 8),
         (4, 4, 8, 128), (2, 2), [(2, 2), (2, 2)]),
        ("block1 entry 2x2x128->64 (1 tap)", (48, 64, 128, 128),
         (2, 2, 128, 64), (1, 1), [(1, 0), (1, 0)]),
        ("block inner wshift 3x2x128->128 (1 tap)", (48, 32, 33, 128),
         (3, 2, 128, 128), (1, 1), [(1, 1), (1, 1)]),
    ]
    rng = np.random.default_rng(0)
    for label, xs, ks, strides, pad in cases:
        # [-126, 126] so the +1 loop perturbation can't wrap at int8
        # extremes (127+1 -> -128), keeping the int8 arm's data
        # distribution identical to the bf16 arm's
        xq = jnp.asarray(rng.integers(-126, 127, xs), jnp.int8)
        kq = jnp.asarray(rng.integers(-127, 128, ks), jnp.int8)
        xb, kb = xq.astype(jnp.bfloat16), kq.astype(jnp.bfloat16)

        def conv(x, kk, acc):
            dn = jax.lax.conv_dimension_numbers(x.shape, kk.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, kk, strides, pad, dimension_numbers=dn,
                preferred_element_type=acc)

        def scan_make(x, kk, acc, cast):
            def make(n):
                @jax.jit
                def loop(x, kk):
                    def body(c, _):
                        y = conv((x + cast(c)).astype(x.dtype), kk, acc)
                        s = y.astype(jnp.float32).sum()
                        return s.astype(jnp.int32) % 2, None
                    c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                        None, length=n)
                    return c
                return lambda: loop(x, kk)
            return make

        tb = timed(scan_make(xb, kb, jnp.float32,
                             lambda c: c.astype(jnp.bfloat16)))
        try:
            tq = timed(scan_make(xq, kq, jnp.int32,
                                 lambda c: (c % 2).astype(jnp.int8)))
            ratio, tq_ms = f"{tb/tq:.2f}x", f"{tq*1e3:7.3f}"
        except Exception as e:
            tq_ms, ratio = "  FAIL ", type(e).__name__[:18]
        print(f"{label:42s} bf16 {tb*1e3:7.3f} ms  int8 {tq_ms} ms  ({ratio})")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
