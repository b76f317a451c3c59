"""Per-stage GCNet timing on TPU at bench shapes (eval mode)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def timed_loop(make_fn, iters=30, warmup=2):
    def run(n):
        fn = make_fn(n)
        int(fn())
        best = float("inf")
        for _ in range(warmup):
            t0 = time.perf_counter()
            int(fn())
            best = min(best, time.perf_counter() - t0)
        return best
    t1 = run(1)
    tn = run(iters)
    return (tn - t1) / (iters - 1)


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from msnets_tpu.models.layers import (Conv3DBlock, ConvBN3D, DeconvBN3D,
                                          SubpixelSoftArgminHead)

    dt = jnp.bfloat16
    nprng = np.random.default_rng(0)

    def scan_time(module, x_shape, label, train=False):
        x = jnp.asarray(nprng.standard_normal(x_shape), dt)
        v = module.init(jax.random.PRNGKey(0), x, train) \
            if not isinstance(module, SubpixelSoftArgminHead) else \
            module.init(jax.random.PRNGKey(0), x)

        def make(n):
            @jax.jit
            def loop(vv, xx):
                def body(c, _):
                    if isinstance(module, SubpixelSoftArgminHead):
                        out = module.apply(vv, xx + c.astype(dt))
                    else:
                        out = module.apply(vv, xx + c.astype(dt), train)
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return lambda: loop(v, x)
        dtm = timed_loop(make)
        print(f"{label:40s} {dtm*1e3:8.2f} ms")
        sys.stdout.flush()

    N, D, H, W = 1, 96, 128, 256
    stages = [
        (ConvBN3D(32, dtype=dt), (N, D, H, W, 8), "conv3dbn_1 8->32"),
        (ConvBN3D(32, dtype=dt), (N, D, H, W, 32), "conv3dbn_2 32->32"),
        (Conv3DBlock(64, 2, dtype=dt), (N, D, H, W, 32), "block_3d_1"),
        (Conv3DBlock(64, 2, dtype=dt), (N, D // 2, H // 2, W // 2, 64), "block_3d_2"),
        (Conv3DBlock(64, 2, dtype=dt), (N, D // 4, H // 4, W // 4, 64), "block_3d_3"),
        (Conv3DBlock(128, 2, dtype=dt), (N, D // 8, H // 8, W // 8, 64), "block_3d_4"),
        (DeconvBN3D(64, dtype=dt), (N, D // 16, H // 16, W // 16, 128), "deconvbn1"),
        (DeconvBN3D(64, dtype=dt), (N, D // 8, H // 8, W // 8, 64), "deconvbn2"),
        (DeconvBN3D(64, dtype=dt), (N, D // 4, H // 4, W // 4, 64), "deconvbn3"),
        (DeconvBN3D(32, dtype=dt), (N, D // 2, H // 2, W // 2, 64), "deconvbn4"),
        (SubpixelSoftArgminHead(2, dtype=dt), (N, D, H, W, 32), "head(deconv5+argmin)"),
    ]
    names = sys.argv[1:]
    for m, shp, label in stages:
        if names and not any(n in label for n in names):
            continue
        scan_time(m, shp, label)


if __name__ == "__main__":
    main()
