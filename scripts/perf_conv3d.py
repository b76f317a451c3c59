"""Isolate 3-D conv cost on TPU: XLA conv3d vs decomposed sum-of-2D-convs.

Shapes = the hottest GCNet layers at bench size (volume [96, 128, 256]).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def timed_loop(make_fn, iters=30, warmup=2):
    import jax

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

    N, D, H, W = 1, 96, 128, 256
    rng = jax.random.PRNGKey(0)

    def scan_time(apply, x, label, flops):
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
        print(f"{label:46s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TFLOPs")
        sys.stdout.flush()

    nprng = np.random.default_rng(0)
    for cin, cout, dt_ in [(32, 32, jnp.bfloat16), (32, 64, jnp.bfloat16)]:
        x = jnp.asarray(nprng.standard_normal((N, D, H, W, cin)), dt_)
        k3 = jnp.asarray(nprng.standard_normal((3, 3, 3, cin, cout)), dt_)
        flops = 2 * N * D * H * W * cin * cout * 27

        def conv3d(a, k3=k3):
            dn = jax.lax.conv_dimension_numbers(a.shape, k3.shape,
                                                ("NDHWC", "DHWIO", "NDHWC"))
            return jax.lax.conv_general_dilated(
                a, k3, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(dt_)

        def conv3d_decomp(a, k3=k3):
            # pad D, then sum of 3 (N*D)-batched 2D convs
            ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            out = None
            for dz in range(3):
                sl = ap[:, dz:dz + D]                     # [N, D, H, W, Cin]
                s2 = sl.reshape(N * D, H, W, cin)
                dn = jax.lax.conv_dimension_numbers(
                    s2.shape, k3[dz].shape, ("NHWC", "HWIO", "NHWC"))
                y = jax.lax.conv_general_dilated(
                    s2, k3[dz], (1, 1), [(1, 1)] * 2, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                out = y if out is None else out + y
            return out.reshape(N, D, H, W, cout).astype(dt_)

        scan_time(conv3d, x, f"conv3d {cin}->{cout} [96,128,256] bf16", flops)
        scan_time(conv3d_decomp, x, f"conv3d-as-2d {cin}->{cout} bf16", flops)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def main2():
    """Variant c: single 2D conv with z-stacked channels; plus deconv timings."""
    import jax
    import jax.numpy as jnp
    N, D, H, W = 1, 96, 128, 256
    nprng = np.random.default_rng(0)

    def scan_time(apply, x, label, flops):
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
        print(f"{label:46s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TFLOPs")
        sys.stdout.flush()

    import jax
    import jax.numpy as jnp
    for cin, cout in [(32, 32), (32, 64)]:
        dt_ = jnp.bfloat16
        x = jnp.asarray(nprng.standard_normal((N, D, H, W, cin)), dt_)
        k3 = jnp.asarray(nprng.standard_normal((3, 3, 3, cin, cout)), dt_)
        flops = 2 * N * D * H * W * cin * cout * 27

        def conv3d_stackz(a, k3=k3, cin=cin, cout=cout):
            ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            zs = jnp.concatenate([ap[:, dz:dz + D] for dz in range(3)], axis=-1)
            s2 = zs.reshape(N * D, H, W, 3 * cin)
            kk = k3.transpose(0, 3, 1, 2, 4).reshape(3 * cin, 3, 3, cout)
            kk = kk.transpose(1, 2, 0, 3)  # [3,3,3cin,cout]
            dn = jax.lax.conv_dimension_numbers(s2.shape, kk.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                s2, kk, (1, 1), [(1, 1)] * 2, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return y.reshape(N, D, H, W, cout).astype(dt_)

        scan_time(conv3d_stackz, x, f"conv3d-stackz {cin}->{cout} bf16", flops)

    # deconv timings (XLA lhs_dilation) at two scales
    for (d, h, w, cin, cout) in [(48, 64, 128, 64, 64), (96, 128, 256, 32, 1)]:
        dt_ = jnp.bfloat16
        x = jnp.asarray(nprng.standard_normal((1, d, h, w, cin)), dt_)
        k3 = jnp.asarray(nprng.standard_normal((3, 3, 3, cin, cout)), dt_)
        flops = 2 * (2*d) * (2*h) * (2*w) * cin * cout * 27 / 8  # ~1/8 taps nonzero

        def deconv(a, k3=k3):
            dn = jax.lax.conv_dimension_numbers(a.shape, k3.shape,
                                                ("NDHWC", "DHWIO", "NDHWC"))
            return jax.lax.conv_general_dilated(
                a, k3, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(dt_)

        scan_time(deconv, x, f"deconv3d {cin}->{cout} [{d},{h},{w}] bf16", flops)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "v2":
    main2()
