"""A/B the stride-2 conv3d lowerings on TPU: native vs space-to-depth."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.models.layers import conv3d_ndhwc, conv3d_s2_space_to_depth

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

    def conv3d_s2_decomposed(x, kernel, pad=1):
        """kz-loop decomposition of the k=3, s=2 conv (spatially strided
        2-D convs on D-strided slices)."""
        kd = kernel.shape[0]
        N, D, H, W, cin = x.shape
        cout = kernel.shape[-1]
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        d_out = (D + 2 * pad - kd) // 2 + 1
        out = None
        for dz in range(kd):
            sl = jax.lax.slice_in_dim(xp, dz, dz + 2 * (d_out - 1) + 1,
                                      stride=2, axis=1)
            s2 = sl.reshape(N * d_out, H, W, cin)
            dn = jax.lax.conv_dimension_numbers(s2.shape, kernel.shape[1:],
                                                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                s2, kernel[dz], (2, 2), [(pad, pad)] * 2,
                dimension_numbers=dn)
            out = y if out is None else out + y
        return out.reshape(N, d_out, out.shape[1], out.shape[2], cout)

    rng = np.random.default_rng(0)
    shapes = [
        ((1, 96, 128, 256, 32), 64, "block1 conv1 32->64 s2 full"),
        ((1, 48, 64, 128, 64), 64, "block2 conv1 64->64 s2 half"),
    ]
    for shp, cout, label in shapes:
        cin = shp[-1]
        x = jnp.asarray(rng.standard_normal(shp), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dt)
        ref = conv3d_ndhwc(x, k, 2, 1, dt)
        for name, fn in [("native", lambda a: conv3d_ndhwc(a, k, 2, 1, dt)),
                         ("s2d", lambda a: conv3d_s2_space_to_depth(a, k, dt)),
                         ("kz-dec", lambda a: conv3d_s2_decomposed(a, k))]:
            got = fn(x)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                        got.astype(jnp.float32))))
            t = timed(fn, x)
            out_vox = np.prod(ref.shape[:4])
            gf = 2 * out_vox * 27 * cin * cout / 1e9
            print(f"{label:30s} {name:7s} err={err:.4f} {t*1e3:7.2f} ms "
                  f"({gf/t/1e3:5.1f} TF)")
            _sys.stdout.flush()


if __name__ == "__main__":
    main()
