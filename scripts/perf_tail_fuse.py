"""Composed decoder-tail variants: can the skip-add/relu fuse into the
deconvbn4 block convs, and what does the whole tail cost end-to-end?

Measured piecewise (perf_packed_tail.py): deconv conv 2.22, d_split_pack
1.53, skip-add+relu 3.28 (incl. repack; the transpose does NOT fuse with
the add), head 3.00 -> ~8.5 ms total. Variants here:
  a) current composed tail (reference point, one jit)
  b) skip repacked to block layout once, then ADDED INSIDE the deconv's
     per-depth-tap 2D conv sum before the [N,D,...] reshape (epilogue
     fusion candidate) + relu at block level
  c) b with the head conv emitting bf16 L (see perf_packed_head.py)
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
                                          _conv_shuffle_kernel, d_split_pack,
                                          deconv3d_s2_packed_out)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    N, Db, Hb, Wb = 1, 48, 64, 128
    x = jnp.asarray(rng.standard_normal((N, Db, Hb, Wb, 64)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64, 32)) * 0.1, dt)
    skip_std = jnp.asarray(rng.standard_normal((N, 2 * Db, Hb, Wb, 128)), dt)
    khead = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 1)) * 0.05,
                        jnp.float32)

    head = SubpixelSoftArgminHead(stride=2, dtype=dt)
    vh = head.init(jax.random.PRNGKey(0),
                   jnp.zeros((N, Db, Hb, Wb, 256), dt), True)
    vh = {"params": {"kernel": khead, "bias": jnp.zeros((1,))}}

    def tail_a(xx):
        y = deconv3d_s2_packed_out(xx, k, dt)
        y = jax.nn.relu(y + d_split_pack(skip_std))
        return head.apply(vh, y, True)

    k2 = _conv_shuffle_kernel(k).astype(dt)

    def deconv_skipfused(xx, skip_blocks):
        """skip_blocks: [N*Db, Hb, Wb, 256] (pre-repacked, block-flat)."""
        xpd = jnp.pad(xx, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        out = skip_blocks
        for bz in range(2):
            sl = xpd[:, bz:bz + Db].reshape(N * Db, Hb, Wb, 64)
            dn = jax.lax.conv_dimension_numbers(sl.shape, k2[bz].shape,
                                                ("NHWC", "HWIO", "NHWC"))
            out = out + jax.lax.conv_general_dilated(
                sl, k2[bz], (1, 1), [(0, 1), (0, 1)],
                dimension_numbers=dn)
        return jax.nn.relu(out).reshape(N, Db, Hb, Wb, 256)

    def tail_b(xx):
        sb = d_split_pack(skip_std).reshape(N * Db, Hb, Wb, 256)
        y = deconv_skipfused(xx, sb)
        return head.apply(vh, y, True)

    def scan_time(apply, label):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx + c.astype(xx.dtype))
                    o = out.ravel()
                    return jax.lax.dynamic_index_in_dim(
                        o, c % o.size, 0, False).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                                    length=n)
                return c
            return lambda: loop(x)
        try:
            d = timed_loop(make)
            print(f"{label:52s} {d*1e3:8.2f} ms")
        except Exception as e:
            print(f"{label:52s} FAILED: {str(e)[:110]}")
        sys.stdout.flush()

    # numeric check under ONE jit (eager op-by-op through the axon relay
    # pays ~35 ms dispatch per op — minutes for a graph this size)
    diff = jax.jit(lambda xx: jnp.max(jnp.abs(
        tail_a(xx) - tail_b(xx))))(x)
    print("a vs b max|diff|:", float(diff))

    scan_time(tail_a, "a current composed tail")
    scan_time(tail_b, "b skip-add fused into deconv block convs")


if __name__ == "__main__":
    main()
