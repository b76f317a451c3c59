"""Why is downsample_half 1.5 ms for a 256x512 uint8 image?

Pieces: gaussian blur only, 2x2 strided-slice average only, reshape-mean
average, full current op, candidate rewrite.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np


def timed_loop(make_fn, iters=50, warmup=2):
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
    from msnets_tpu.ops.features import downsample_half, _gaussian_kernel1d

    H, W = 256, 512
    nprng = np.random.default_rng(0)
    img = jnp.asarray(nprng.integers(0, 256, (H, W), dtype=np.uint8))

    kern = _gaussian_kernel1d()
    r = (len(kern) - 1) // 2

    def gauss_axis(a, axis):
        ap = jnp.pad(a, [(r, r) if i == axis else (0, 0) for i in range(2)])
        n = a.shape[axis]
        acc = None
        for i, kv in enumerate(kern):
            sl = jax.lax.slice_in_dim(ap, i, i + n, axis=axis)
            acc = sl * np.float32(kv) if acc is None else acc + sl * np.float32(kv)
        return acc

    def scan_time(apply, label):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx ^ (c % 2).astype(jnp.uint8))
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return lambda: loop(img)
        try:
            d = timed_loop(make)
            print(f"{label:40s} {d*1e3:8.3f} ms")
        except Exception as e:
            print(f"{label:40s} FAILED: {str(e)[:100]}")
        sys.stdout.flush()

    scan_time(downsample_half, "full downsample_half (current)")
    scan_time(lambda im: (gauss_axis(gauss_axis(im.astype(jnp.float32), 0), 1)
                          ).astype(jnp.uint8),
              "gaussian only")

    def avg_strided(im):
        x = im.astype(jnp.float32)
        oh, ow = H // 2, W // 2
        x = (x[0:2*oh:2, 0:2*ow:2] + x[0:2*oh:2, 1:2*ow:2]
             + x[1:2*oh:2, 0:2*ow:2] + x[1:2*oh:2, 1:2*ow:2]) * 0.25
        return x.astype(jnp.uint8)
    scan_time(avg_strided, "2x2 average, strided slices")

    def avg_reshape(im):
        x = im.astype(jnp.float32)
        x = x.reshape(H // 2, 2, W // 2, 2).sum(axis=(1, 3)) * 0.25
        return x.astype(jnp.uint8)
    scan_time(avg_reshape, "2x2 average, reshape+reduce")

    def rewrite(im):
        x = im.astype(jnp.float32) / 255.0
        x = gauss_axis(gauss_axis(x, 0), 1)
        x = x.reshape(H // 2, 2, W // 2, 2)
        x = (x[:, 0, :, 0] + x[:, 0, :, 1] + x[:, 1, :, 0] + x[:, 1, :, 1]) * 0.25
        return (x * 255.0).astype(jnp.uint8)
    scan_time(rewrite, "rewrite: gauss + reshape-slice avg")

    def rewrite2(im):
        x = im.astype(jnp.float32) / 255.0
        x = gauss_axis(gauss_axis(x, 0), 1)
        x = x.reshape(H // 2, 2, W // 2, 2).sum(axis=(1, 3)) * 0.25
        return (x * 255.0).astype(jnp.uint8)
    scan_time(rewrite2, "rewrite: gauss + reshape-reduce avg")


if __name__ == "__main__":
    main()
