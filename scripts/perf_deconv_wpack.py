"""ConvTranspose3d(k=3, s=2, p=1, op=1) lowerings, round 2: W-phase packing.

Known results (scripts/perf_deconv.py): XLA's dense lhs_dilation lowering
computes 8x wasted FLOPs but wins end-to-end because conv_shuffle's
depth-to-space transpose (all three axes interleaved at once) is slow at the
large deconvbn4 output.

"wpack": pack ONLY the W phase into output channels — the (W, pw, cout) ->
(2W, cout) interleave is a plain reshape (free, W and C are the two minor
dims); handle the 4 (pz, ph) D/H phase combos as separate exact convs and
interleave them with one stack+reshape whose inner contiguous chunks are
2W*cout (~16 KB — an efficient transpose). FLOPs = 4/3 x the real work
(the W k=2 pack has 3 of 4 slots live), vs 8x for dense.

MEASURED NEGATIVE RESULT (v5e, 2026-08-17): wpack 5.31 ms vs dense 3.01 ms
at the deconvbn4 shape (slight win only at deconvbn3: 0.52 vs 0.62). The
nine W+1=129-wide convs (misaligned lanes) each re-read x, and the phase
stack still moves the full output. Dense stays the default. KEY FINDING:
the dense deconv is only 3.01 of the 5.68 ms deconvbn4 *stage* — the BN
f32 round-trip is ~2.7 ms, which motivated eval-mode conv-BN folding in
models/layers.py.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np


def deconv3d_wpack(x, kernel, dtype):
    import jax
    import jax.numpy as jnp
    from msnets_tpu.models.layers import _deconv_phase_taps
    N, D, H, W, cin = x.shape
    cout = kernel.shape[-1]
    taps = _deconv_phase_taps(2)
    x = x.astype(dtype)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))

    def k_w(kz, ky):
        # [woff=2, cin, pw=2, cout]: out[2m]   = K[kz,ky,1] @ x[m]
        #                            out[2m+1] = K[kz,ky,0] @ x[m] + K[kz,ky,2] @ x[m+1]
        z = jnp.zeros((2, cin, 2, cout), kernel.dtype)
        z = z.at[0, :, 0, :].set(kernel[kz, ky, 1])
        z = z.at[0, :, 1, :].set(kernel[kz, ky, 0])
        z = z.at[1, :, 1, :].set(kernel[kz, ky, 2])
        return z.reshape(1, 2, cin, 2 * cout).astype(dtype)

    def c(oz, oy, k2):
        sl = xp[:, oz:oz + D, oy:oy + H, :, :]
        s2 = sl.reshape(N * D, H, W + 1, cin)
        dn = jax.lax.conv_dimension_numbers(s2.shape, k2.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(s2, k2, (1, 1), [(0, 0), (0, 0)],
                                         dimension_numbers=dn)
        return y.reshape(N, D, H, 2 * W, cout)

    O = [[None, None], [None, None]]
    for pz in range(2):
        for ph in range(2):
            acc = None
            for kz, oz in taps[pz]:
                for ky, oy in taps[ph]:
                    y = c(oz, oy, k_w(kz, ky))
                    acc = y if acc is None else acc + y
            O[pz][ph] = acc
    A = jnp.stack([jnp.stack(O[pz], axis=3) for pz in range(2)], axis=2)
    # A: [N, D, pz, H, ph, 2W, cout]
    return A.reshape(N, 2 * D, 2 * H, 2 * W, cout)


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.models.layers import Deconv3D

    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

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
        ((1, 6, 8, 16, 128), 64, "tiny (parity check)"),
        ((1, 12, 16, 32, 64), 64, "deconvbn2 in"),
        ((1, 24, 32, 64, 64), 64, "deconvbn3 in"),
        ((1, 48, 64, 128, 64), 32, "deconvbn4 in"),
    ]
    for shp, cout, label in shapes:
        cin = shp[-1]
        x = jnp.asarray(rng.standard_normal(shp), dt)
        kern = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dt)
        mod = Deconv3D(cout, dtype=dt, mode="dense")
        v = {"params": {"kernel": kern}}
        ref = mod.apply(v, x)
        got = deconv3d_wpack(x, kern, dt)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                    got.astype(jnp.float32))))
        gf = 2 * np.prod(shp[:4]) * 27 * cin * cout / 1e9   # real FLOPs
        if jax.default_backend() == "cpu":
            print(f"{label:20s} err={err:.5f}")
            _sys.stdout.flush()
            continue
        td = timed(lambda a: mod.apply(v, a), x)
        tw = timed(lambda a: deconv3d_wpack(a, kern, dt), x)
        print(f"{label:20s} err={err:.5f}  dense {td*1e3:6.2f} ms "
              f"({gf/td/1e3:5.1f} TF)  wpack {tw*1e3:6.2f} ms ({gf/tw/1e3:5.1f} TF)")
        _sys.stdout.flush()


if __name__ == "__main__":
    main()
