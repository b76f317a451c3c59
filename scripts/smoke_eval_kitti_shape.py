"""Hardware smoke: full-resolution KITTI cross-val inference (384x1248,
D=192) through the evaluator's device path — the largest production shape.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from msnets_tpu.config import MatchingConfig, ModelConfig
    from msnets_tpu.models import build_model
    from msnets_tpu.ops.features import ms_features_test

    H, W, D = 384, 1248, 192
    mcfg = MatchingConfig()
    model = build_model(ModelConfig(name="MS-GCNet", max_disp=D))
    rng = np.random.default_rng(0)
    iml = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    feats_shape = (1, D // 2, H // 2, W // 2, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(feats_shape, jnp.float32), train=False)

    @jax.jit
    def fwd(variables, a, b):
        f = ms_features_test(a, b, D, mcfg, True)[None]
        return model.apply(variables, f, train=False)

    t0 = time.time()
    out = fwd(variables, iml, imr)
    disp = np.asarray(out)
    print(f"compile+run {time.time()-t0:.0f}s  out {disp.shape} "
          f"range [{disp.min():.2f}, {disp.max():.2f}] "
          f"finite={np.isfinite(disp).all()}")
    t0 = time.perf_counter()
    disp = np.asarray(fwd(variables, iml, imr))
    print(f"steady-state {1e3*(time.perf_counter()-t0):.0f} ms/frame "
          f"(incl. ~35 ms relay dispatch)")


if __name__ == "__main__":
    main()
