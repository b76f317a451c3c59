"""Where does the train step's device time go? features / fwd+loss / full.

Times three programs at the reference recipe (crop 256x512, D=192, batch 2,
bf16 compute, train-mode BN) with the repo's scan discipline: each program
runs inside an on-device lax.scan with a real data dependency between
iterations, timed as (scan(N) - scan(1)) / (N - 1) so the axon relay's
~30 ms dispatch/fetch latency cancels. (A first cut of this script timed
per-call with a value fetch and "found" a 30 ms feature stage — that was
the relay, not the chip; see PERF.md timing discipline.)

  (a) features only        — vmapped ms_features_train
  (b) features+fwd+loss    — no grad, BN mutable
  (c) the full train step  — value_and_grad + Adam (Trainer step semantics)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from _perf_common import scan_time

N_ITERS = 10


def main():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer
    from msnets_tpu.engine import loss as L
    from msnets_tpu.ops.features import ms_features_train

    mcfg = MatchingConfig()
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name="MS-GCNet", max_disp=192),
                 train=TrainConfig(crop_height=256, crop_width=512,
                                   batch_size=2),
                 data=DataConfig())
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(2))
    rng = np.random.default_rng(0)
    bh, bwl = mcfg.board_h, 192
    shape = (2, 256 + 2 * bh, 512 + bwl)
    iml = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    target = jnp.asarray(np.full((2, 256, 512), 8.0, np.float32))
    lr = jnp.asarray(1e-3, jnp.float32)
    model = tr.model

    def feats(a, b):
        return jax.vmap(lambda x, y: ms_features_train(
            x, y, 192, mcfg, bh, bwl, 0, mcfg.left_only, jnp.bfloat16))(a, b)

    def chain(a):
        """uint8 image with a carry-derived data dependency XLA cannot fold.

        The first version used carry*0 — XLA constant-folds x*0 -> 0 and
        hoists the entire body out of the scan (stage (a) 'measured' 0.4 ms).
        XORing the LSB with a data-dependent bit is unfoldable; it flips
        pixel LSBs depending on the carry value, which is irrelevant for a
        perf probe."""
        def inner(carry):
            bit = (carry.astype(jnp.int32) & 1).astype(jnp.uint8)
            return a ^ bit
        return inner

    def make_feats_loop(n):
        @jax.jit
        def loop():
            def body(carry, _):
                f = feats(chain(iml)(carry), imr)
                # Full-volume sum as the carry, deliberately: a tiny-slice
                # carry would let XLA slice backwards through the elementwise
                # stages and DCE most of the work (the failure mode
                # perf_shift_slices.py caught — see PERF.md). The sum fuses
                # into the producer; measured cost <=0.2 ms, negligible vs
                # the ~30 ms stage, so it does not distort the (b)-(a) delta.
                return jnp.sum(f, dtype=jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out
        return loop

    def make_fwd_loop(n):
        @jax.jit
        def loop():
            def body(carry, _):
                f = feats(chain(iml)(carry), imr)
                mask = L.train_valid_mask(target, 192)
                disp, _ = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    f, train=True, mutable=["batch_stats"])
                return L.gcnet_loss(disp, target, mask, False, 3.0, 2.0), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out
        return loop

    step = tr.step_fn(bh, bwl, 0)

    def make_step_loop(n):
        # the real step donates/replaces state; emulate by scanning the
        # functional core: thread state through the scan carry
        @jax.jit
        def loop():
            def body(carry, _):
                st, dep = carry
                s2, m, _ = step(st, chain(iml)(dep), imr, target, lr)
                return (s2, m["loss"]), None
            (st, out), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                        length=n)
            return out
        return loop

    ta = scan_time(make_feats_loop, N_ITERS)
    tb = scan_time(make_fwd_loop, N_ITERS)
    tc = scan_time(make_step_loop, N_ITERS)

    print(f"(a) features only      : {ta*1e3:7.1f} ms (batch 2)")
    print(f"(b) features+fwd+loss  : {tb*1e3:7.1f} ms -> model fwd ~ {(tb-ta)*1e3:.1f}")
    print(f"(c) full train step    : {tc*1e3:7.1f} ms -> bwd+opt ~ {(tc-tb)*1e3:.1f}"
          f"  (bwd/fwd ratio {(tc-tb)/max(tb-ta,1e-9):.2f})")


if __name__ == "__main__":
    main()
