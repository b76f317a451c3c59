"""pz-SPLIT decoder tail: kill the d_split_pack repack entirely.

Idea: deconvbn4 emits TWO cout-128 slabs S0/S1 (depth parity pz of the
full-res volume) instead of one (pz,ph,pw,c)-packed tensor. The skip x2
[N, 96, Hb, Wb, 128] then aligns with a FREE reshape view
[N, 48, 2, Hb, Wb, 128] (slab t adds x2v[:, :, t]) — no 1.53 ms
d_split_pack transpose — and the adds sit on conv epilogues. The head
reads the slab pair with a 4-conv window-2 decomposition (taps grouped by
(slab, block-offset)), W-folded so cout stays 128.

Measured reference points (perf_packed_tail.py / perf_packed_head.py):
current tail = conv 2.22 + repack 1.53 + add/relu 1.75 + head 2.25.
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


def build_head_slab_kernels(kernel, cin, dtype):
    """Head (deconv5+softmax prep) kernels for slab input.

    Returns kg[s][bd]: [2, 2, 2*2*cin_slab, 128] where s = source slab
    parity, bd = D block offset, input channels (u, qh, qw, c) of the
    W-FOLDED slab (u = folded Wb pair position), output channels
    (u_out, p(pz,ph,pw), q(qd,qh,qw)) = 2*8*8 = 128.

    Derivation: L[B, Bh, B'w, u_out, p, q] sums taps (kz, ky, kx) with
    offsets (oz, oy, ox) = _deconv_phase_taps(2)[pz/ph/pw]; the D read
    (2B + qd) + oz lands in slab s = (qd+oz)&1 at block B + ((qd+oz)>>1);
    H read 2Bh + qh + oy -> block Bh + ((qh+oy)>>1), phase (qh+oy)&1;
    W read (folded): Bw = 2B'w + u_out, block Bw + ((qw+ox)>>1) =
    2B'w + u_out + ((qw+ox)>>1) -> folded block B'w + dx', channel pair
    phase (u_out + ((qw+ox)>>1)) & 1, dx' = (u_out + ((qw+ox)>>1)) >> 1.
    """
    import jax.numpy as jnp
    from msnets_tpu.models.layers import _deconv_phase_taps
    taps = _deconv_phase_taps(2)
    # S[s][bd][dx'][oy_blk(2)][u_in(2), qh_in(2), qw_in(2), tap(27),
    #                          u_out(2), p(8), q(8)]
    import numpy as _np
    sel = _np.zeros((2, 2, 2, 2, 2, 2, 2, 27, 2, 8, 8), _np.float32)
    for pz in range(2):
        for ph in range(2):
            for pw in range(2):
                p = (pz * 2 + ph) * 2 + pw
                for qd in range(2):
                    for qh in range(2):
                        for qw in range(2):
                            q = (qd * 2 + qh) * 2 + qw
                            for kz, oz in taps[pz]:
                                for ky, oy in taps[ph]:
                                    for kx, ox in taps[pw]:
                                        t = (kz * 3 + ky) * 3 + kx
                                        s = (qd + oz) & 1
                                        bd = (qd + oz) >> 1
                                        bh = (qh + oy) >> 1
                                        hph = (qh + oy) & 1
                                        for u_out in range(2):
                                            wblk = u_out + ((qw + ox) >> 1)
                                            dxp = wblk >> 1
                                            u_in = wblk & 1
                                            wph = (qw + ox) & 1
                                            sel[s, bd, dxp, bh, u_in, hph,
                                                wph, t, u_out, p, q] = 1.0
    kflat = kernel.reshape(27, cin).astype(jnp.float32)
    # -> per (s, bd): [2(bh), 2(dx'), u_in, hph, wph, cin, u_out, p, q]
    kg = jnp.einsum("sbxhuvwtopq,tc->sbxhuvwcopq", jnp.asarray(sel), kflat)
    # input channels of W-folded slab: (u_in, qh(hph? no...)) — slab
    # channels are (qh, qw, c); W-fold adds u_in in FRONT: (u_in, qh, qw, c)
    # kernel spatial dims: (bh window 2, dx' window 2)
    kg = jnp.transpose(kg, (0, 1, 3, 2, 4, 5, 6, 7, 8, 9, 10))
    # [s, bd, bh, dx', u_in, hph, wph, c, u_out, p, q]
    return kg.reshape(2, 2, 2, 2, 2 * 2 * 2 * cin, 2 * 8 * 8)


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.models.layers import (_conv_shuffle_kernel, d_split_pack,
                                          deconv3d_s2_packed_out,
                                          SubpixelSoftArgminHead)
    small = bool(int(_os.environ.get("PZSPLIT_SMALL", "0")))
    dt = jnp.float32 if small else jnp.bfloat16
    rng = np.random.default_rng(0)
    N, Db, Hb, Wb, cin, cout = ((2, 3, 4, 6, 5, 3) if small else
                                (1, 48, 64, 128, 64, 32))
    x = jnp.asarray(rng.standard_normal((N, Db, Hb, Wb, cin)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1, dt)
    skip = jnp.asarray(rng.standard_normal((N, 2 * Db, Hb, Wb, 4 * cout)), dt)
    khead = jnp.asarray(rng.standard_normal((3, 3, 3, cout, 1)) * 0.05,
                        jnp.float32)

    head = SubpixelSoftArgminHead(stride=2, dtype=dt)
    vh = {"params": {"kernel": khead, "bias": jnp.zeros((1,))}}

    # ---- current tail --------------------------------------------------
    def tail_current(xx):
        y = deconv3d_s2_packed_out(xx, k, dt)
        y = jax.nn.relu(y + d_split_pack(skip))
        return head.apply(vh, y, True)

    # ---- pz-split tail -------------------------------------------------
    kbig = _conv_shuffle_kernel(k).astype(dt)       # [2,2,2,cin,8*cout]
    kpz = kbig.reshape(2, 2, 2, cin, 2, 4 * cout)   # out (pz, ph.pw.c)
    skv = skip.reshape(N, Db, 2, Hb, Wb, 4 * cout)
    kg = build_head_slab_kernels(khead, cout, dt).astype(dt)

    def slabs(xx):
        xpd = jnp.pad(xx, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        out = []
        for t in range(2):
            acc = skv[:, :, t].reshape(N * Db, Hb, Wb, 4 * cout)
            for bz in range(2):
                sl = xpd[:, bz:bz + Db].reshape(N * Db, Hb, Wb, cin)
                dn = jax.lax.conv_dimension_numbers(
                    sl.shape, kpz[bz, ..., t, :].shape,
                    ("NHWC", "HWIO", "NHWC"))
                acc = acc + jax.lax.conv_general_dilated(
                    sl, kpz[bz, ..., t, :], (1, 1), [(0, 1), (0, 1)],
                    dimension_numbers=dn)
            out.append(jax.nn.relu(acc))            # [N*Db, Hb, Wb, 128]
        return out

    ar2 = jnp.arange(2, dtype=jnp.float32)
    w = (4.0 * jnp.arange(Db, dtype=jnp.float32)[:, None, None]
         + ar2[None, :, None] + 2.0 * ar2[None, None, :])  # [Db, pz, qd]
    w2 = jnp.stack([w, jnp.ones_like(w)], axis=-1)

    def tail_pzsplit(xx):
        S = slabs(xx)
        # W-fold each slab (free reshape): [N*Db, Hb, Wb/2, 256]
        Sf = [s.reshape(N * Db, Hb, Wb // 2, 2 * 4 * cout) for s in S]
        L = None
        for s in range(2):
            for bd in range(2):
                src = Sf[s]
                if bd:
                    # D block offset: V[...] at block B+1 -> shift slab up
                    src = jnp.pad(src.reshape(N, Db, Hb, Wb // 2, -1)[:, 1:],
                                  ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
                    src = src.reshape(N * Db, Hb, Wb // 2, -1)
                dn = jax.lax.conv_dimension_numbers(
                    src.shape, kg[s, bd].shape, ("NHWC", "HWIO", "NHWC"))
                y = jax.lax.conv_general_dilated(
                    src, kg[s, bd], (1, 1), [(0, 1), (0, 1)],
                    dimension_numbers=dn, preferred_element_type=dt)
                L = y if L is None else L + y
        # [N, Db, Hb, W'b, (u, pz, ph, pw, qd, qh, qw)]
        L = L.reshape(N, Db, Hb, Wb // 2, 2, 2, 2, 2, 2, 2, 2)
        red = (1, 5, 8)                    # Db, pz, qd
        gmax = L.max(axis=red, keepdims=True).astype(jnp.float32)
        e = jnp.exp(L.astype(jnp.float32) - gmax)
        nd = jnp.einsum("nahwuzyxdef,azdk->nhwuyxefk", e, w2)
        disp = nd[..., 0] / nd[..., 1]     # [N, Hb, W'b, u, ph, pw, qh, qw]
        # rows: 4Bh + 2qh + ph; cols: 4(2B'w+u) + 2qw + pw
        out = jnp.transpose(disp, (0, 1, 6, 4, 2, 3, 7, 5))
        return out.reshape(N, 4 * Hb, 4 * Wb)

    if small:
        # numeric check runs on CPU only (PZSPLIT_SMALL=1) — the combined
        # diff graph took >25 min to compile through the axon relay
        diff = jax.jit(lambda xx: jnp.max(jnp.abs(
            tail_current(xx) - tail_pzsplit(xx))))(x)
        print("current vs pzsplit max|diff| px:", float(diff))
        assert float(diff) < 1e-4, "pz-split tail mismatch"
        print("numeric check OK")
        return

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

    scan_time(tail_current, "current tail (packed_out + repack + head)")
    scan_time(tail_pzsplit, "pz-split tail (slab adds + 4-conv head)")


if __name__ == "__main__":
    main()
