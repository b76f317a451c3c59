"""How should the full-res volume get INTO packed layout cheaply?

Measured on v5e: the one-shot hw_pack transpose costs 4.37 ms on the
8-channel input (minor dim 8 -> 94% tile-padding waste). Candidates:
 a) composition: W-fold (pure reshape, free) + H-parity move (minor dim
    stays intact) at several channel widths
 b) conv1 reading FULL-res input with stride 2 and a 4x4 expanded kernel,
    emitting packed (ph, pw, c) output directly — no input transpose at all
 c) d_split_pack (depth-parity fold) at decoder widths
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
    from msnets_tpu.models.layers import hw_pack, d_split_pack
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    N, D, H, W = 1, 96, 128, 256

    def scan_time(apply, inp, label):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx + c.astype(xx.dtype))
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return lambda: loop(inp)
        try:
            d = timed_loop(make)
            print(f"{label:52s} {d*1e3:8.2f} ms")
        except Exception as e:
            print(f"{label:52s} FAILED: {str(e)[:110]}")
        sys.stdout.flush()

    def h_move(x2c):
        # [N, D, H, Wb, c] -> [N, D, H/2, Wb, 2c]: fold H parity into channels
        n, d, h, wb, c = x2c.shape
        xs = x2c.reshape(n, d, h // 2, 2, wb, c)
        return jnp.transpose(xs, (0, 1, 2, 4, 3, 5)).reshape(n, d, h // 2, wb, 2 * c)

    def wfold_hmove(x):
        n, d, h, w, c = x.shape
        return h_move(x.reshape(n, d, h, w // 2, 2 * c))

    x8 = jnp.asarray(rng.standard_normal((N, D, H, W, 8)), dt)
    scan_time(hw_pack, x8, "hw_pack one-shot transpose (8ch)")
    scan_time(wfold_hmove, x8, "W-fold + H-move (8ch full-res)")
    # NOTE: wfold_hmove channel order is (qh, qw, c)? W-fold gives (qw? ...)
    # W-fold folds adjacent W pairs -> channel (qw, c); H-move prepends qh ->
    # (qh, qw, c): matches hw_pack. Verified numerically below.
    ok = bool(jnp.array_equal(hw_pack(x8), wfold_hmove(x8)))
    print("wfold_hmove == hw_pack:", ok); sys.stdout.flush()

    for c in (16, 64, 128):
        xc = jnp.asarray(rng.standard_normal((N, D, H, W // 2, c)), dt)
        scan_time(h_move, xc, f"H-move alone ({c}ch, half-W tensor)")

    xstd = jnp.asarray(rng.standard_normal((N, D, H // 2, W // 2, 128)), dt)
    scan_time(d_split_pack, xstd, "d_split_pack (128ch)")

    # (b) conv1 full-res -> packed via one stride-2 4x4 expanded kernel.
    # K4[(2+qh-ph? ...)]: output block (bh, bw) phase (ph, pw) = full-res
    # (2bh+ph, 2bw+pw); tap dy in 0..2 reads full-res row 2bh+ph-1+dy =
    # conv4 window position (with stride 2, pad lo 1): row 2bh - 1 + t,
    # t in 0..3  =>  t = ph + dy.
    cin, cout = 8, 32
    k3 = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1, dt)

    # build k4 per depth tap with a numpy selector: S[t_h, t_w, dy, dx, p]
    S = np.zeros((4, 4, 3, 3, 4), np.float32)
    for ph in range(2):
        for pw in range(2):
            p = ph * 2 + pw
            for dy in range(3):
                for dx in range(3):
                    S[ph + dy, pw + dx, dy, dx, p] = 1.0
    Sj = jnp.asarray(S)

    def conv1_s2_expanded(x):
        xpd = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = None
        for dz in range(3):
            k2d = k3[dz].reshape(3, 3, cin, cout).astype(jnp.float32)
            k4 = jnp.einsum("twyxp,yxio->twipo", Sj, k2d).reshape(
                4, 4, cin, 4 * cout).astype(dt)
            sl = xpd[:, dz:dz + D].reshape(N * D, H, W, cin)
            dn = jax.lax.conv_dimension_numbers(sl.shape, k4.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(sl, k4, (2, 2),
                                             [(1, 2), (1, 2)],
                                             dimension_numbers=dn)
            out = y if out is None else out + y
        return out.reshape(N, D, H // 2, W // 2, 4 * cout)

    scan_time(conv1_s2_expanded, x8, "conv1 full->packed s2 4x4 kernel")

    # correctness vs pack-then-packed-conv
    from msnets_tpu.models.layers import conv3d_ndhwc
    ref = conv3d_ndhwc(x8.astype(jnp.float32), k3.astype(jnp.float32), 1, 1,
                       jnp.float32)
    got = conv1_s2_expanded(x8).astype(jnp.float32)
    n_, d_, hb, wb, _ = got.shape
    got_full = got.reshape(n_, d_, hb, wb, 2, 2, cout)
    got_full = jnp.transpose(got_full, (0, 1, 2, 4, 3, 5, 6)).reshape(
        n_, d_, 2 * hb, 2 * wb, cout)
    err = float(jnp.abs(got_full - ref).max())
    print("conv1_s2_expanded max err vs full conv:", err)


if __name__ == "__main__":
    main()
