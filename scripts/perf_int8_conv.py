"""int8 vs bf16 conv microbenchmark at the eval graph's dominant shapes.

v5e's MXU peaks at 2x the bf16 rate for s8 x s8 -> s32. If XLA lowers
int8 convs to the MXU through this toolchain, a quantized eval mode could
buy up to 2x on the conv-bound stages (stem/block1/tail ~ 15 ms of the
21.5 ms eval budget). Shapes mirror the packed-layout 2-D convs the model
actually runs (conv3d decomposed over D).
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

    # (label, NHW, cin, cout, k): packed stem conv2 (N=D/2=96 slices of
    # [64,128] at 128ch), block1 inner (48, [32,64], 256ch W-folded),
    # deconvbn4-like tail conv (96, [64,128], 128->128)
    cases = [
        ("stem-like  96x64x128 c128->c128", (96, 64, 128), 128, 128, 3),
        ("block-like 48x32x64  c256->c256", (48, 32, 64), 256, 256, 3),
        ("tail-like  96x64x128 c64->c256 k2", (96, 64, 128), 64, 256, 2),
    ]
    rng = np.random.default_rng(0)
    for label, nhw, cin, cout, k in cases:
        N, H, W = nhw
        xq = jnp.asarray(rng.integers(-127, 128, (N, H, W, cin)), jnp.int8)
        kq = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
        xb = xq.astype(jnp.bfloat16)
        kb = kq.astype(jnp.bfloat16)

        def conv(x, kk, acc):
            dn = jax.lax.conv_dimension_numbers(x.shape, kk.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, kk, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=dn, preferred_element_type=acc)

        def scan_make(x, kk, acc, cast):
            def make(n):
                @jax.jit
                def loop(x, kk):
                    def body(c, _):
                        y = conv((x + cast(c)).astype(x.dtype), kk, acc)
                        # consume the FULL output — a sliced consumer lets
                        # XLA compute only a window of the conv
                        s = y.astype(jnp.float32).sum()
                        return s.astype(jnp.int32) % 2, None
                    c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                        None, length=n)
                    return c
                return lambda: loop(x, kk)
            return make

        tb = timed(scan_make(xb, kb, jnp.float32, lambda c: c.astype(jnp.bfloat16)))
        try:
            tq = timed(scan_make(xq, kq, jnp.int32, lambda c: (c % 2).astype(jnp.int8)))
            ratio = f"{tb/tq:.2f}x"
            tq_ms = f"{tq*1e3:7.3f}"
        except Exception as e:
            tq_ms, ratio = "  FAIL ", type(e).__name__[:18]
        print(f"{label:36s} bf16 {tb*1e3:7.3f} ms  int8 {tq_ms} ms  ({ratio})")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
