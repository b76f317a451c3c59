"""Packed soft-argmin head variants at bench shapes.

The head's window-2 block conv emits L = [1, 48, 64, 128, 64] logits; at
fp32 that is 403 MB materialized + re-read by the softmax passes (gmax,
num, den) -> ~3.0 ms measured, vs a ~1 ms bandwidth floor if L stays bf16
and the reductions fuse. Variants:
  a) current: conv preferred_element_type=f32, reductions on f32 L
  b) L bf16 (conv native accum), subtract-max + exp in f32 on the fly
  c) b + num/den as one einsum with a stacked weight (single pass over e)
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
                                          _deconv_phase_taps)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    N, Db, Hb, Wb, cin = 1, 48, 64, 128, 32
    x = jnp.asarray(rng.standard_normal((N, Db, Hb, Wb, 8 * cin)), dt)
    kernel = jnp.asarray(rng.standard_normal((3, 3, 3, cin, 1)) * 0.05,
                         jnp.float32)

    head = SubpixelSoftArgminHead(stride=2, dtype=dt)
    vh = head.init(jax.random.PRNGKey(0), x, True)
    vh = jax.tree.map(lambda a, b: b if a.shape == kernel.shape else a,
                      vh, {"params": {"kernel": kernel,
                                      "bias": jnp.zeros((1,))}})

    taps = _deconv_phase_taps(2)
    S = np.zeros((2, 2, 2, 8, 27, 64), np.float32)
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
                                        sd, sh, sw = qd + oz, qh + oy, qw + ox
                                        S[sd >> 1, sh >> 1, sw >> 1,
                                          ((sd & 1) * 2 + (sh & 1)) * 2 + (sw & 1),
                                          (kz * 3 + ky) * 3 + kx,
                                          p * 8 + q] = 1.0
    kflat = kernel.reshape(27, cin).astype(jnp.float32)
    kbig = jnp.einsum("zhwqtp,tc->zhwqcp", jnp.asarray(S), kflat)
    kbig = kbig.reshape(2, 2, 2, 8 * cin, 64).astype(dt)

    def conv_L(xq, pet):
        xpd = jnp.pad(xq, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        L = None
        for bz in range(2):
            sl = xpd[:, bz:bz + Db].reshape(N * Db, Hb, Wb, 8 * cin)
            dn = jax.lax.conv_dimension_numbers(sl.shape, kbig[bz].shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                sl, kbig[bz], (1, 1), [(0, 1), (0, 1)],
                dimension_numbers=dn, preferred_element_type=pet)
            L = y if L is None else L + y
        return L.reshape(N, Db, Hb, Wb, 2, 2, 2, 2, 2, 2)

    ar2 = jnp.arange(2, dtype=jnp.float32)
    w = (4.0 * jnp.arange(Db, dtype=jnp.float32)[:, None, None]
         + ar2[None, :, None] + 2.0 * ar2[None, None, :])
    red = (1, 4, 7)

    def reduce_f32(L):
        gmax = L.max(axis=red, keepdims=True)
        e = jnp.exp(L - gmax)
        den = e.sum(axis=red)
        num = jnp.einsum("nahwzyxdef,azd->nhwyxef", e, w)
        disp = num / den
        out = jnp.transpose(disp, (0, 1, 5, 3, 2, 6, 4))
        return out.reshape(N, 4 * Hb, 4 * Wb)

    def variant_b(xq):
        L = conv_L(xq, jnp.bfloat16)
        gmax = L.max(axis=red, keepdims=True).astype(jnp.float32)
        e = jnp.exp(L.astype(jnp.float32) - gmax)
        den = e.sum(axis=red)
        num = jnp.einsum("nahwzyxdef,azd->nhwyxef", e, w)
        disp = num / den
        out = jnp.transpose(disp, (0, 1, 5, 3, 2, 6, 4))
        return out.reshape(N, 4 * Hb, 4 * Wb)

    def variant_c(xq):
        L = conv_L(xq, jnp.bfloat16)
        gmax = L.max(axis=red, keepdims=True).astype(jnp.float32)
        e = jnp.exp(L.astype(jnp.float32) - gmax)
        w2 = jnp.stack([w, jnp.ones_like(w)], axis=-1)   # [Db,2,2,2]
        nd = jnp.einsum("nahwzyxdef,azdk->nhwyxefk", e, w2)
        disp = nd[..., 0] / nd[..., 1]
        out = jnp.transpose(disp, (0, 1, 5, 3, 2, 6, 4))
        return out.reshape(N, 4 * Hb, 4 * Wb)

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

    # numeric check of b/c vs a on small slice (CPU-precision not needed;
    # compare on-device)
    ref = head.apply(vh, x, True)
    for name, fn in (("b", variant_b), ("c", variant_c)):
        got = fn(x)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"variant {name} max |diff| vs current: {err:.4f} px")

    scan_time(lambda xx: head.apply(vh, xx, True), "a current packed head (f32 L)")
    scan_time(variant_b, "b bf16 L, f32 exp/reduce")
    scan_time(variant_c, "c bf16 L, single-pass num/den einsum")


if __name__ == "__main__":
    main()
