"""Is the [H,W,D,8] -> [D,H,W,8] transpose the feature stage's hidden cost?

features_full = 7.31 ms but the matcher pieces sum to ~1.7 ms
(perf_breakdown.py). Times: the final assembly transpose alone, the full
test-path features, and the same with the transpose dropped.
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
    from msnets_tpu.config import MatchingConfig
    from msnets_tpu.ops import features as F
    from msnets_tpu.ops.features import compute_costs, _normalize_stack

    cfg = MatchingConfig()
    rng = np.random.default_rng(0)
    H, W, D = 256, 512, 192
    iml = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    def scan_time(apply, inp, label, depkey=None):
        def make(n):
            @jax.jit
            def loop(xx):
                def body(c, _):
                    out = apply(xx ^ (c % 2).astype(xx.dtype))
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

    def feats_with_transpose(im):
        return F.ms_features_test(im, imr, D, cfg, True)

    def feats_no_transpose(im):
        s = cfg.ds_scale
        a, b2 = F.downsample_half(im), F.downsample_half(imr)
        b = 10
        a = jnp.pad(a, ((b, b), (b, b)))
        b2 = jnp.pad(b2, ((b, b), (b, b)))
        costs = compute_costs(a, b2, D // s, cfg.censw, cfg.nccw, cfg.sadw,
                              cfg.sobelw, b, b, b)
        return _normalize_stack(*costs, cfg)          # [H, W, D, 8] — no T

    scan_time(feats_with_transpose, iml, "ms_features_test (with [D,H,W] transpose)")
    scan_time(feats_no_transpose, iml, "ms_features_test minus final transpose")

    def prep(im):
        a, b2 = F.downsample_half(im), F.downsample_half(imr)
        b = 10
        return (jnp.pad(a, ((b, b), (b, b))), jnp.pad(b2, ((b, b), (b, b))))

    def costs_only(im):
        a, b2 = prep(im)
        cc = compute_costs(a, b2, D // 2, cfg.censw, cfg.nccw, cfg.sadw,
                           cfg.sobelw, 10, 10, 10)
        return cc[0] + cc[1] + cc[2] + cc[3]

    scan_time(lambda a: prep(a)[0].astype(jnp.int32).sum()[None], iml,
              "downsample + pad only")
    scan_time(costs_only, iml, "compute_costs (4 matcher+AML volumes)")

    # individual matchers at the padded shape, through the real call path
    from msnets_tpu.ops import matchers as M

    def one(name):
        def f(im):
            a, b2 = prep(im)
            if name == "census":
                return M.census(a, b2, D // 2, cfg.censw)
            if name == "ncc":
                return M.ncc_nister(a, b2, D // 2, cfg.nccw)
            if name == "zsad":
                return M.zsad(a, b2, D // 2, cfg.sadw)
            if name == "sadsob":
                return M.sadsob(M.sobel(a), M.sobel(b2), D // 2, cfg.sobelw)
            if name == "aml4":
                cc = compute_costs(a, b2, D // 2, cfg.censw, cfg.nccw,
                                   cfg.sadw, cfg.sobelw, 10, 10, 10)
                return (M.extract_aml(cc[0], cfg.cens_sigma)
                        + M.extract_aml(cc[1], cfg.ncc_sigma)
                        + M.extract_aml(cc[2], cfg.sad_sigma)
                        + M.extract_aml(cc[3], cfg.sad_sigma))
        return f

    for nm in ("census", "ncc", "zsad", "sadsob", "aml4"):
        try:
            scan_time(one(nm), iml, f"{nm} via real path (padded)")
        except Exception as e:
            print(nm, "skip:", str(e)[:80])


if __name__ == "__main__":
    main()
