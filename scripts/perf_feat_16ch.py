"""16-channel (L+R, cbmv_F=16) feature-stage cost at bench shapes.

Times the in-graph device feature stage alone, 8-ch vs 16-ch, at the bench
eval shape (512x256, D=192, half-res features) with the scan-delta
discipline (PERF.md). The 16-ch assembly adds the right-view re-indexing
(slice-form get_right_cost, ops/matchers.py) on every matcher channel +
4 more AML passes — this script puts a production-scale number on that
(VERDICT r3 item 5; reference cbmv_generator.py:84-254).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np

N_ITERS = 10
H, W, D = 256, 512, 192


def _scan_time(make_loop):
    loop_n, loop_1 = make_loop(N_ITERS), make_loop(1)
    float(loop_n()); float(loop_1())
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(loop_n()); tn = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop_1()); t1 = time.perf_counter() - t0
        dt = (tn - t1) / (N_ITERS - 1)
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import MatchingConfig
    from msnets_tpu.ops.features import ms_features_test

    rng = np.random.default_rng(0)
    iml = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    for F in (8, 16):
        mcfg = MatchingConfig(num_channels=F)

        def make_loop(n, mcfg=mcfg):
            @jax.jit
            def loop():
                def body(carry, _):
                    bit = (carry.astype(jnp.int32) & 1).astype(jnp.uint8)
                    f = ms_features_test(iml ^ bit, imr, D, mcfg,
                                         mcfg.left_only, jnp.bfloat16)
                    return jnp.sum(f, dtype=jnp.float32), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return out
            return loop

        t = _scan_time(make_loop) * 1e3
        print(f"feature stage cbmv_F={F:2d}: {t:6.2f} ms/pair "
              f"(bench shape {W}x{H}, D={D})", flush=True)


if __name__ == "__main__":
    main()
