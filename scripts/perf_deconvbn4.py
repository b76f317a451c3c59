"""Where do deconvbn4's 5.7 ms go? (input [1,48,64,128,64] -> [1,96,128,256,32])

Variants: bare dense deconv, +bias epilogue, full folded DeconvBN3D eval,
explicit-BN (unfolded) path, subpixel lowering, f32 vs bf16.
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
    from msnets_tpu.models.layers import (DeconvBN3D, deconv3d_apply,
                                          deconv3d_subpixel)
    dt = jnp.bfloat16
    nprng = np.random.default_rng(0)
    cin, cout = 64, 32
    x = jnp.asarray(nprng.standard_normal((1, 48, 64, 128, cin)), dt)
    k = jnp.asarray(nprng.standard_normal((3, 3, 3, cin, cout)) * 0.1, dt)
    b = jnp.asarray(nprng.standard_normal(cout), dt)

    def scan_time(apply, label):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx + c.astype(dt))
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return lambda: loop(x)
        try:
            d = timed_loop(make)
            print(f"{label:44s} {d*1e3:8.2f} ms")
        except Exception as e:
            print(f"{label:44s} FAILED: {str(e)[:100]}")
        sys.stdout.flush()

    scan_time(lambda a: deconv3d_apply(a, k, 2, dt), "dense deconv bare")
    scan_time(lambda a: deconv3d_apply(a, k, 2, dt) + b, "dense deconv + bias")
    scan_time(lambda a: deconv3d_subpixel(a, k, 2, dt) + b, "subpixel deconv + bias")
    scan_time(lambda a: deconv3d_apply(a, k, 2, dt, "conv_shuffle") + b,
              "conv_shuffle deconv + bias")

    # conv_shuffle WITHOUT the final depth-to-space: output stays phase-packed
    # [N, D, H, W, 8*cout] — isolates the packed conv from the interleave.
    from msnets_tpu.models.layers import _deconv_phase_taps
    taps = _deconv_phase_taps(2)
    k2 = jnp.zeros((2, 2, 2, cin, 8 * cout), k.dtype)
    for pz in range(2):
        for ph in range(2):
            for pw in range(2):
                phase = (pz * 2 + ph) * 2 + pw
                for kz, oz in taps[pz]:
                    for ky, oy in taps[ph]:
                        for kx, ox in taps[pw]:
                            k2 = k2.at[oz, oy, ox, :,
                                       phase * cout:(phase + 1) * cout].set(
                                k[kz, ky, kx])
    k2 = jnp.asarray(k2, dt)

    def packed_only(a):
        dn = jax.lax.conv_dimension_numbers(
            a.shape, k2.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            a, k2, (1, 1, 1), [(0, 1)] * 3, dimension_numbers=dn)
    scan_time(packed_only, "conv_shuffle packed conv only (no shuffle)")

    m = DeconvBN3D(cout, dtype=dt)
    v = m.init(jax.random.PRNGKey(0), x, False)
    scan_time(lambda a: m.apply(v, a, False), "DeconvBN3D eval (folded)")

    # unfolded: deconv then f32 affine round trip (the old code path)
    g = jnp.asarray(nprng.standard_normal(cout), jnp.float32)
    bb = jnp.asarray(nprng.standard_normal(cout), jnp.float32)
    def unfolded(a):
        y = deconv3d_apply(a, k, 2, dt).astype(jnp.float32)
        return ((y - 0.1) * g + bb).astype(dt)
    scan_time(unfolded, "dense deconv + f32 affine round trip")


if __name__ == "__main__":
    main()
