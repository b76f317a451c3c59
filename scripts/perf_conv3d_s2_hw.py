"""Stride-2 conv3d lowerings, round 2: HW-only space-to-depth.

The full 3-axis space-to-depth lost to native (2.37x padded FLOPs,
scripts/perf_conv3d_s2d.py). Two refinements:

A) s2d on H,W only ((4/3)^2 = 1.78x padding) + D handled by parity split:
   out[m] = K[1]*xe[m] + K[2]*xo[m] + K[0]*xo[m-1]  (xe/xo = even/odd D
   planes) — three stride-1 2-D convs over (N*Dout, H/2, W/2, 4cin).
B) 3-axis s2d as before, but the k=2 block conv decomposed per kz into two
   stride-1 2-D convs (avoids XLA's slow native conv3d) — 2.37x padding
   but only contiguous slices.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np


def hw_block_kernel(kernel, kz, dtype):
    """K[kz] (3,3,cin,cout) -> block kernel (2,2,4cin,cout) for H,W s2d.

    kp[b, o] = K[2b + o - 1] per axis (front-pad 3 -> 4, split (block, off));
    input channel order must be (oh, ow, c).
    """
    import jax.numpy as jnp
    k = kernel[kz]                                     # [3,3,cin,cout]
    kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [4,4,cin,cout]
    cin, cout = k.shape[2], k.shape[3]
    kp = kp.reshape(2, 2, 2, 2, cin, cout)             # [bh,oh,bw,ow,ci,co]
    k2 = jnp.transpose(kp, (0, 2, 1, 3, 4, 5)).reshape(2, 2, 4 * cin, cout)
    return k2.astype(dtype)


def conv3d_s2_hw_s2d(x, kernel, dtype):
    """Variant A: k=3, stride-2, pad-1 conv3d via HW space-to-depth +
    D-parity decomposition. x: [N, D, H, W, C] (D, H, W even)."""
    import jax
    import jax.numpy as jnp
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3)
    N, D, H, W, _ = x.shape
    x = x.astype(dtype)
    H2, W2, D2 = H // 2, W // 2, D // 2
    xs = x.reshape(N, D, H2, 2, W2, 2, cin)
    xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5, 6)).reshape(N, D, H2, W2, 4 * cin)
    xe = xs[:, 0::2]                                   # planes 2m
    xo = xs[:, 1::2]                                   # planes 2m+1
    xo_m1 = jnp.pad(xo, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :D2]

    def c2d(v, k2):
        s2 = v.reshape(N * D2, H2, W2, 4 * cin)
        dn = jax.lax.conv_dimension_numbers(s2.shape, k2.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(s2, k2, (1, 1), [(1, 0), (1, 0)],
                                         dimension_numbers=dn)
        return y.reshape(N, D2, H2, W2, cout)

    return (c2d(xe, hw_block_kernel(kernel, 1, dtype)) +
            c2d(xo, hw_block_kernel(kernel, 2, dtype)) +
            c2d(xo_m1, hw_block_kernel(kernel, 0, dtype)))


def conv3d_s2_full_s2d_decomp(x, kernel, dtype):
    """Variant B: 3-axis space-to-depth, then the k=2 block conv decomposed
    over its depth taps into two stride-1 2-D convs."""
    import jax
    import jax.numpy as jnp
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3)
    N, D, H, W, _ = x.shape
    D2, H2, W2 = D // 2, H // 2, W // 2
    x = x.astype(dtype)
    xs = x.reshape(N, D2, 2, H2, 2, W2, 2, cin)
    xs = jnp.transpose(xs, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        N, D2, H2, W2, 8 * cin)
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    kp = kp.reshape(2, 2, 2, 2, 2, 2, cin, cout)
    k2 = jnp.transpose(kp, (0, 2, 4, 1, 3, 5, 6, 7)).reshape(
        2, 2, 2, 8 * cin, cout).astype(dtype)
    xs_m1 = jnp.pad(xs, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :D2]

    def c2d(v, khw):
        s2 = v.reshape(N * D2, H2, W2, 8 * cin)
        dn = jax.lax.conv_dimension_numbers(s2.shape, khw.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(s2, khw, (1, 1), [(1, 0), (1, 0)],
                                         dimension_numbers=dn)
        return y.reshape(N, D2, H2, W2, cout)

    return c2d(xs_m1, k2[0]) + c2d(xs, k2[1])


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.models.layers import conv3d_ndhwc

    dt = jnp.bfloat16

    def timed(fn, x, iters=20):
        def make(n):
            @jax.jit
            def loop(a):
                def body(c, _):
                    out = fn(a + c.astype(a.dtype))
                    return out.astype(jnp.float32).sum().astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return loop
        l1, ln = make(1), make(iters)
        def run(l):
            int(l(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); int(l(x)); best = min(best, time.perf_counter() - t0)
            return best
        return (run(ln) - run(l1)) / (iters - 1)

    rng = np.random.default_rng(0)
    shapes = [
        ((1, 96, 128, 256, 32), 64, "block1 s2 32->64 full"),
        ((1, 48, 64, 128, 64), 64, "block2 s2 64->64 half"),
    ]
    for shp, cout, label in shapes:
        cin = shp[-1]
        x = jnp.asarray(rng.standard_normal(shp), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dt)
        ref = conv3d_ndhwc(x, k, 2, 1, dt)
        for name, fn in [("hw_s2d", conv3d_s2_hw_s2d),
                         ("full_s2d_decomp", conv3d_s2_full_s2d_decomp)]:
            got = fn(x, k, dt)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                        got.astype(jnp.float32))))
            t = timed(lambda a, f=fn: f(a, k, dt), x)
            gf = 2 * np.prod(ref.shape[:4]) * 27 * cin * cout / 1e9
            print(f"{label:24s} {name:16s} err={err:.4f} {t*1e3:7.2f} ms "
                  f"({gf/t/1e3:5.1f} eff TF)")
            _sys.stdout.flush()
        t0 = timed(lambda a: conv3d_ndhwc(a, k, 2, 1, dt), x)
        gf = 2 * np.prod(ref.shape[:4]) * 27 * cin * cout / 1e9
        print(f"{label:24s} {'native':16s} err=0.0000 {t0*1e3:7.2f} ms "
              f"({gf/t0/1e3:5.1f} eff TF)")
        _sys.stdout.flush()


if __name__ == "__main__":
    main()
