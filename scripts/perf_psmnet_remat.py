"""MS-PSMNet selective-remat A/B at the reference recipe (VERDICT r2 #7).

For remat_scope in {all, hourglass}: AOT memory analysis first (safe probe),
then execute + time the step only if XLA says it fits.

Usage: python scripts/perf_psmnet_remat.py [scope ...]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import numpy as np


def probe(scope: str):
    import jax, jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer

    mcfg = MatchingConfig()
    # scope "accum": NO remat, batch 2 as two sequential micro-batches —
    # activations halve (the no-remat batch-2 estimate is ~20 GiB) and no
    # recompute is paid; BN stats thread sequentially (the established
    # grad_accum semantics = consecutive reference steps)
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name="MS-PSMNet", max_disp=192),
                 train=TrainConfig(crop_height=256, crop_width=512,
                                   batch_size=2,
                                   remat=scope not in ("none", "accum"),
                                   remat_scope="all" if scope in
                                   ("none", "accum") else scope,
                                   grad_accum=2 if scope == "accum" else 1),
                 data=DataConfig())
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(2))
    bh, bwl = mcfg.board_h, 192
    im = jax.ShapeDtypeStruct((2, 256 + 2 * bh, 512 + bwl), jnp.uint8)
    tgt = jax.ShapeDtypeStruct((2, 256, 512), jnp.float32)
    lr_s = jax.ShapeDtypeStruct((), jnp.float32)
    fn = tr.step_fn(bh, bwl, 0)
    m = fn.lower(state, im, im, tgt, lr_s).compile().memory_analysis()
    gb = 1024 ** 3
    peak = (m.temp_size_in_bytes + m.argument_size_in_bytes
            + m.output_size_in_bytes - m.alias_size_in_bytes) / gb
    print(f"scope={scope}: temp {m.temp_size_in_bytes/gb:.2f} GiB, "
          f"peak ~= {peak:.2f} GiB (v5e 16)")
    sys.stdout.flush()
    # XLA's static analysis overshoots the executed peak (round 3: 16.3 GiB
    # estimated remat-all EXECUTED fine at 658.6 ms; round 4 estimates run
    # ~1-2 GiB higher still while executing) — treat the estimate as
    # relative and let execution be the real test up to a safety margin.
    if peak > 18.5:
        print(f"scope={scope}: SKIP execution (estimate far over budget)")
        return

    rng = np.random.default_rng(0)
    shape = (2, 256 + 2 * bh, 512 + bwl)
    iml = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    disp = jnp.asarray(np.full((2, 256, 512), 8.0, np.float32))
    lr = jnp.asarray(1e-3, jnp.float32)
    state, met, _ = fn(state, iml, imr, disp, lr)
    _ = float(met["loss"])
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, met, _ = fn(state, iml, imr, disp, lr)
        _ = float(met["loss"])
        times.append(time.perf_counter() - t0)
    ts = sorted(times)
    print(f"scope={scope}: min {ts[0]*1e3:.1f} ms/step, "
          f"med {ts[len(ts)//2]*1e3:.1f} -> {2/ts[0]:.2f} pairs/s")
    sys.stdout.flush()


if __name__ == "__main__":
    for s in (sys.argv[1:] or ["all", "hourglass"]):
        try:
            probe(s)
        except Exception as e:  # OOM-at-compile etc. — keep probing others
            print(f"scope={s}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]})")
            sys.stdout.flush()
