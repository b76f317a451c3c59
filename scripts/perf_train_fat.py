"""Hunt the train step's composition fat (VERDICT r4 item 2).

The round-4 stage-marginal budget (perf_train_prefix.py) sums to ~129 ms at
the reference recipe while the whole step measures ~156 ms scan-basis —
~25 ms lives BETWEEN stages. This script gets objective data on where:

  1. scan-basis full-step time (the honest number the target is set on),
  2. the TPU-compiled optimized HLO of the step, aggregated by instruction
     kind — copies / transposes / reshapes-with-layout-change are exactly
     the "re-layout glue between lowerings and their VJPs" hypothesis, and
     their output bytes bound the HBM time they can cost,
  3. top instructions by output bytes among the glue categories, with the
     op_name metadata that names the source stage.

Usage:  python scripts/perf_train_fat.py [--hlo-only]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
import sys
import time
from collections import defaultdict

import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2,
               "u16": 2}


def shape_bytes(shape_str: str) -> int:
    """'f32[2,96,128,256]{3,2,1,0}' -> bytes (tuples sum their leaves)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def build():
    import jax, jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer

    model = "MS-PSMNet" if "--psmnet" in sys.argv else "MS-GCNet"
    # MS-PSMNet reference-recipe CLI default: no-remat micro-batching
    tkw = dict(remat=False, grad_accum=2) if model == "MS-PSMNet" else {}
    mcfg = MatchingConfig()
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name=model, max_disp=192),
                 train=TrainConfig(crop_height=256, crop_width=512,
                                   batch_size=2, **tkw),
                 data=DataConfig())
    tr = Trainer(cfg)
    state = tr.init_state(tr.feats_shape_for(2))
    rng = np.random.default_rng(0)
    bh, bwl = mcfg.board_h, 192
    shape = (2, 256 + 2 * bh, 512 + bwl)
    iml = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    imr = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    disp = jnp.asarray(np.full((2, 256, 512), 8.0, np.float32))
    lr = jnp.asarray(1e-3, jnp.float32)
    return tr, state, iml, imr, disp, lr, bh, bwl


def scan_step_time(tr, state, iml, imr, disp, lr, bh, bwl, iters=8):
    """Scan-basis ms/step: every grad leaf feeds the carry via the updated
    params (state threads through the scan), so nothing DCEs."""
    import jax, jax.numpy as jnp
    inner = tr.step_fn(bh, bwl, 0)

    def make_loop(n):
        @jax.jit
        def loop(state, iml, imr, disp, lr):
            def body(carry, _):
                st = carry
                a = iml ^ (st.step % 2).astype(jnp.uint8)
                st2, m, _ = inner._fun(st, a, imr, disp, lr) \
                    if hasattr(inner, "_fun") else inner(st, a, imr, disp, lr)
                return st2, m["loss"]
            st, losses = jax.lax.scan(body, state, None, length=n)
            # anchor the carry on a param leaf so the Adam update chain is
            # live (model-agnostic: first leaf of the param tree)
            leaf = jax.tree_util.tree_leaves(st.params)[0]
            return losses.sum() + leaf.sum().astype(jnp.float32)
        return loop

    # NOTE: calling the jitted inner inside jit retraces its python body —
    # fine, it is the same graph.
    loop_n, loop_1 = make_loop(iters), make_loop(1)
    args = (state, iml, imr, disp, lr)
    float(loop_n(*args)); float(loop_1(*args))
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); float(loop_n(*args)); tn = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop_1(*args)); t1 = time.perf_counter() - t0
        d = (tn - t1) / (iters - 1)
        best = d if best is None else min(best, d)
    return best * 1e3


def hlo_glue_report(tr, state, iml, imr, disp, lr, bh, bwl, top=25):
    import jax
    fn = tr.step_fn(bh, bwl, 0)
    compiled = fn.lower(state, iml, imr, disp, lr).compile()
    txt = compiled.as_text()
    cat_bytes = defaultdict(int)
    cat_count = defaultdict(int)
    glue = []
    in_entry = False
    for line in txt.splitlines():
        # only ENTRY-computation instructions materialize buffers; fusion
        # bodies (%fused_computation...) are free internal ops
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if line.startswith("}"):
            in_entry = False
            continue
        if not in_entry:
            continue
        m = re.match(r"\s*(%?[\w.-]+)\s*=\s*((?:\([^)]*\))|\S+)\s+(\w[\w-]*)\(",
                     line)
        if not m:
            continue
        name, shp, op = m.groups()
        b = shape_bytes(shp)
        kind = op
        if op == "fusion":
            km = re.search(r"kind=(\w+)", line)
            kind = f"fusion.{km.group(1) if km else '?'}"
        cat_bytes[kind] += b
        cat_count[kind] += 1
        if op in ("copy", "transpose", "bitcast", "reshape", "convert",
                  "copy-start", "dynamic-update-slice", "pad", "slice"):
            om = re.search(r'op_name="([^"]*)"', line)
            glue.append((b, op, name, (om.group(1) if om else "")[:110]))
    print("\n== optimized-HLO bytes by instruction kind (top 15) ==")
    for k in sorted(cat_bytes, key=cat_bytes.get, reverse=True)[:15]:
        print(f"  {k:24s} {cat_bytes[k]/2**20:9.1f} MB  x{cat_count[k]}")
    glue.sort(reverse=True)
    print(f"\n== top {top} standalone glue ops by output bytes ==")
    for b, op, name, src in glue[:top]:
        print(f"  {b/2**20:8.1f} MB  {op:10s} {name:28s} {src}")
    # rough memory-bound time bound for the glue total (read+write ~ 2x
    # bytes at ~819 GB/s v5e HBM)
    gb = sum(b for b, *_ in glue) / 2**30
    print(f"\nglue total {gb:.2f} GB output bytes -> >= {gb*2/0.8*1e3/1024:.1f}"
          f" ms at 819 GB/s (read+write)")
    return txt


def main():
    tr, state, iml, imr, disp, lr, bh, bwl = build()
    if "--time-only" not in sys.argv:
        txt = hlo_glue_report(tr, state, iml, imr, disp, lr, bh, bwl)
        out = "/tmp/train_step_hlo.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(f"[saved optimized HLO to {out}]")
    if "--hlo-only" not in sys.argv:
        ms = scan_step_time(tr, state, iml, imr, disp, lr, bh, bwl)
        print(f"\nfull train step scan-basis: {ms:.1f} ms/step "
              f"({2e3/ms:.2f} pairs/s)")
        try:
            fn = tr.step_fn(bh, bwl, 0)
            ca = fn.lower(state, iml, imr, disp, lr).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            if fl:
                mfu = fl / (ms * 1e-3) / 197e12
                print(f"whole-graph train MFU: {mfu:.3f} "
                      f"({fl/1e12:.2f} TFLOP/step analytical, v5e bf16 peak "
                      f"197 TFLOP/s)")
        except Exception as e:
            print(f"cost_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
