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

import numpy as np

from _perf_common import scan_time as _scan_time

N_ITERS = 10
H, W, D = 256, 512, 192


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
