"""Can the 8-channel volume materialization avoid its 16x write amplification?

jnp.stack(ch, axis=-1) makes [H,W,D,8]: XLA maps the 8-wide minor dim to the
128 lanes -> ~16x padded stores (~4 ms in-graph). Variants:
  b) stack on axis 2 -> [H,W,8,D]: minor dim D=96 -> 1.33x padding only
  c) (b) + conv1 consuming [N,H,W,C,D] via conv dimension_numbers, one conv
     with window (4,4,3) strides (2,2,1) (the packed-entry expanded kernel)
  d) current pipeline: stack -1, transpose, 3-tap expanded conv1
All timed in-graph behind the real compute_costs producers.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np


def timed_loop(make_fn, iters=20, warmup=2):
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
    from msnets_tpu.config import MatchingConfig
    from msnets_tpu.ops import matchers as M
    from msnets_tpu.ops.features import compute_costs, downsample_half

    cfg = MatchingConfig()
    rng = np.random.default_rng(0)
    H, W, D = 256, 512, 192
    iml = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    dt = jnp.bfloat16
    cin, cout = 8, 32
    k3 = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1, dt)

    def channels(im):
        a, b2 = downsample_half(im), downsample_half(imr)
        b = 10
        a = jnp.pad(a, ((b, b), (b, b)))
        b2 = jnp.pad(b2, ((b, b), (b, b)))
        cc, cn, cs, cz = compute_costs(a, b2, D // 2, cfg.censw, cfg.nccw,
                                       cfg.sadw, cfg.sobelw, b, b, b)
        return [
            (jnp.clip(cc, 0.0, 120.0) / 120.0).astype(dt),
            ((1.0 + jnp.clip(cn, -1.0, 1.0)) / 2.0).astype(dt),
            (jnp.clip(cs, 0.0, 2.0 ** 13) / 2.0 ** 13).astype(dt),
            (jnp.clip(cz, 0.0, 2.0 ** 13) / 2.0 ** 13).astype(dt),
            M.extract_aml(cc, cfg.cens_sigma).astype(dt),
            M.extract_aml(cn, cfg.ncc_sigma).astype(dt),
            M.extract_aml(cs, cfg.sad_sigma).astype(dt),
            M.extract_aml(cz, cfg.sad_sigma).astype(dt),
        ]

    def scan_time(apply, label):
        def make(n):
            @jax.jit
            def loop():
                def body(c, _):
                    out = apply(iml ^ (c % 2).astype(jnp.uint8))
                    o = out.ravel(); return jax.lax.dynamic_index_in_dim(o, c % o.size, 0, False).astype(jnp.float32).astype(jnp.int32) % 2, None
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=n)
                return c
            return loop
        try:
            d = timed_loop(make)
            print(f"{label:52s} {d*1e3:8.2f} ms")
        except Exception as e:
            print(f"{label:52s} FAILED: {str(e)[:110]}")
        sys.stdout.flush()

    scan_time(lambda im: jnp.stack(channels(im), axis=-1),
              "b0 stack axis -1 [H,W,D,8] (current)")
    scan_time(lambda im: jnp.stack(channels(im), axis=2),
              "b stack axis 2 [H,W,8,D]")

    # expanded 4x4x3 kernel for full->packed conv1 (see layers.py
    # conv3d_s1_full_to_packed), as one conv with D spatial
    S = np.zeros((4, 4, 3, 3, 4), np.float32)
    for ph in range(2):
        for pw in range(2):
            p = ph * 2 + pw
            for dy in range(3):
                for dx in range(3):
                    S[ph + dy, pw + dx, dy, dx, p] = 1.0
    Sj = jnp.asarray(S)
    # k4 [4(th), 4(tw), 3(td), cin, 4cout]; k3 is [kd,kh,kw,ci,co]
    k4 = jnp.einsum("twyxp,yxzio->twzipo", Sj,
                    jnp.transpose(k3, (1, 2, 0, 3, 4)).astype(jnp.float32))
    k4 = k4.reshape(4, 4, 3, cin, 4 * cout).astype(dt)

    def conv1_nhwcd(im):
        f = jnp.stack(channels(im), axis=2)[None]    # [1, H2, W2, 8, D2]
        dn = jax.lax.conv_dimension_numbers(
            f.shape, k4.shape, ("NHWCD", "HWDIO", "NHWDC"))
        return jax.lax.conv_general_dilated(
            f, k4, (2, 2, 1), [(1, 2), (1, 2), (1, 1)],
            dimension_numbers=dn)

    scan_time(conv1_nhwcd, "c stack2 + conv1 one-shot NHWCD")

    def conv1_current(im):
        f = jnp.stack(channels(im), axis=-1)
        f = jnp.transpose(f, (2, 0, 1, 3))[None]     # [1, D2, H2, W2, 8]
        from msnets_tpu.models.layers import conv3d_s1_full_to_packed
        return conv3d_s1_full_to_packed(f, k3, dt, False)

    scan_time(conv1_current, "d current stack+transpose+conv1-expanded")


if __name__ == "__main__":
    main()
