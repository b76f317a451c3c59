"""Compare stride-1 conv3d lowerings: per-kz loop (current) vs one wide-N
2-D conv over all kz taps + shifted adds.

The per-kz decomposition runs kd 2-D convs each with only cout output
channels (cout=32 -> 25% MXU lane utilization). The wide variant runs ONE
2-D conv with kd*cout outputs (96/192 lanes) and reduces the kz groups with
shifted adds over D — identical FLOPs, 3x the MXU N-dim.

MEASURED NEGATIVE RESULT (v5e, 2026-08-17): the wide variant loses across
the board — the 3x-wider output must be materialized to HBM and re-read by
the shifted adds, and that extra bandwidth swamps the lane-utilization win:
  conv3dbn_1 8->32  full: cur 1.21 ms (36 TF)  wide 4.29 ms (10 TF)
  conv3dbn_2 32->32 full: cur 3.70 ms (47 TF)  wide 5.07 ms (34 TF)
  block1 64->64     half: cur 0.53 ms (165 TF) wide 1.69 ms (51 TF)
The per-kz loop stays (models/layers.py conv3d_ndhwc).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.models.layers import conv3d_ndhwc

    dt = jnp.bfloat16

    def conv3d_wide(x, kernel, pad, dtype):
        kd, kh, kw, cin, cout = kernel.shape
        N, D, H, W, _ = x.shape
        x = x.astype(dtype)
        k2 = jnp.transpose(kernel, (1, 2, 3, 0, 4)).reshape(
            kh, kw, cin, kd * cout).astype(dtype)          # [kh,kw,cin,kd*cout]
        s2 = x.reshape(N * D, H, W, cin)
        dn = jax.lax.conv_dimension_numbers(s2.shape, k2.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            s2, k2, (1, 1), [(pad, pad)] * 2, dimension_numbers=dn)
        h_out, w_out = y.shape[1], y.shape[2]
        y = y.reshape(N, D, h_out, w_out, kd, cout)
        # out[:, d] = sum_kz y[:, d + kz - pad, ..., kz]
        yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
        out = None
        for kz in range(kd):
            sl = jax.lax.slice_in_dim(yp, kz, kz + D, axis=1)[..., kz, :]
            out = sl if out is None else out + sl
        return out

    def timed(fn, *args, iters=20):
        def make(n):
            @jax.jit
            def loop(a):
                def body(c, _):
                    out = fn(a + c.astype(a.dtype), *args)
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
        ((1, 96, 128, 256, 8), 32, "conv3dbn_1 8->32 full"),
        ((1, 96, 128, 256, 32), 32, "conv3dbn_2 32->32 full"),
        ((1, 48, 64, 128, 64), 64, "block1 conv2/3 64->64 half"),
    ]
    for shp, cout, label in shapes:
        cin = shp[-1]
        x = jnp.asarray(rng.standard_normal(shp), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dt)
        ref = conv3d_ndhwc(x, k, 1, 1, dt)
        got = conv3d_wide(x, k, 1, dt)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        t_cur = timed(lambda a: conv3d_ndhwc(a, k, 1, 1, dt))
        t_new = timed(lambda a: conv3d_wide(a, k, 1, dt))
        gf = 2 * np.prod(shp[:4]) * 27 * cin * cout / 1e9
        print(f"{label:28s} err={err:.4f}  cur {t_cur*1e3:7.2f} ms ({gf/t_cur/1e3:5.1f} TF)"
              f"  wide {t_new*1e3:7.2f} ms ({gf/t_new/1e3:5.1f} TF)")
        _sys.stdout.flush()


if __name__ == "__main__":
    main()
