"""Per-mesh-axis collective-traffic accounting from the compiled sharded HLO
(VERDICT r3 item 4 -> SCALING.md).

For each mesh axis in isolation (a 2-device mesh on that axis alone, so
every collective in the module is attributable to it) this compiles the
REAL graphs at production shapes on the CPU backend and sums the bytes
moved by each collective kind in the optimized (post-SPMD-partitioning)
HLO:

  * train step  — reference recipe: crop 256x512, D=192, batch 2
                  (the full uint8 -> features -> MS-GCNet -> loss -> grads
                  -> Adam graph Trainer._build_step jits)
  * eval fwd    — KITTI cross-val shape 384x1248, batch 1 (serve graph)

Axes (parallel/mesh.py): data = DP gradient psum; spatial = H-axis conv
halo exchange; disp = disparity-axis softmax/soft-argmin reductions.

Bytes are HLO output-shape bytes per op; per-chip wire traffic estimates
use the standard ring factors: all-reduce 2(n-1)/n x bytes, all-gather /
reduce-scatter (n-1)/n x bytes, collective-permute 1 x bytes (n = devices
on the axis; n = 2 here, so all-reduce = 1x, gather/scatter = 0.5x).

Usage (CPU, no TPU needed — this is a compile-only analysis):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_analysis.py
"""
import os as _os, sys as _sys
_os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
_os.environ.setdefault("JAX_PLATFORMS", "cpu")
_os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import re
from collections import defaultdict

import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2,
               "u16": 2}
COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")
# per-chip wire-traffic factor on a 2-device ring
WIRE_FACTOR = {"all-reduce": 1.0, "all-gather": 0.5, "reduce-scatter": 0.5,
               "collective-permute": 1.0, "all-to-all": 0.5}


def collective_bytes(hlo_text: str):
    """{kind: (count, output_bytes)} summed over the module. Tuple-shaped
    outputs (variadic all-reduce) sum their leaf shapes. Asyncified
    collectives (`all-reduce-start` etc.) count via their -start op; the
    matching -done op is skipped so nothing double-counts."""
    out = defaultdict(lambda: [0, 0])
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*((?:\([^)]*\))|(?:\S+))\s+(" +
                      "|".join(COLLECTIVES) + r")(-start|-done)?[(.]", line)
        if not m:
            continue
        shapes, kind, suffix = m.group(1), m.group(2), m.group(3)
        if suffix == "-done":
            continue
        nbytes = 0
        for dt, dims in shape_re.findall(shapes):
            if dt not in DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES[dt]
        out[kind][0] += 1
        out[kind][1] += nbytes
    return {k: tuple(v) for k, v in out.items()}


def train_step_hlo(mesh):
    import jax, jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer
    mcfg = MatchingConfig()
    cfg = Config(matching=mcfg,
                 model=ModelConfig(name="MS-GCNet", max_disp=192),
                 train=TrainConfig(crop_height=256, crop_width=512,
                                   batch_size=2, remat=False),
                 data=DataConfig())
    tr = Trainer(cfg, mesh=mesh)
    state = tr.init_state(tr.feats_shape_for(2))
    bh, bwl = mcfg.board_h, 192
    shape = (2, 256 + 2 * bh, 512 + bwl)
    iml = jnp.zeros(shape, jnp.uint8)
    imr = jnp.zeros(shape, jnp.uint8)
    disp = jnp.zeros((2, 256, 512), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    fn = tr.step_fn(bh, bwl, 0)
    return fn.lower(state, iml, imr, disp, lr).compile().as_text()


def eval_fwd_hlo(mesh):
    import jax, jax.numpy as jnp
    from msnets_tpu.config import Config, MatchingConfig, ModelConfig
    from msnets_tpu.models import build_model
    from msnets_tpu.ops.features import ms_features_test
    from msnets_tpu.parallel import mesh as pm
    mcfg = MatchingConfig()
    model = build_model(ModelConfig(name="MS-GCNet", max_disp=192))
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 96, 16, 32, 8)), train=False),
        jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    def fwd(variables, a, b):
        import jax as _j
        f = ms_features_test(a, b, 192, mcfg, True, jnp.bfloat16)[None]
        f = _j.lax.with_sharding_constraint(f, pm.shard(mesh, pm.VOLUME))
        with pm.active_mesh(mesh):
            return model.apply(variables, f, train=False)

    a = jnp.zeros((384, 1248), jnp.uint8)
    import jax as _j
    return _j.jit(fwd).lower(variables, a, a).compile().as_text()


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")   # sitecustomize forces axon;
    # env vars alone are not honored once it ran (see .claude/skills/verify)
    from msnets_tpu.parallel import mesh as pm
    devs = jax.devices()
    results = {}
    for axis, shape in (("data", (2, 1, 1)), ("spatial", (1, 2, 1)),
                        ("disp", (1, 1, 2))):
        mesh = pm.make_mesh(shape, devices=devs[:2])
        row = {}
        for graph, build in (("train", train_step_hlo), ("eval", eval_fwd_hlo)):
            if axis == "data" and graph == "eval":
                row[graph] = {}   # eval is batch 1: no data axis
                continue
            print(f"[scaling] compiling {graph} with {axis}=2 ...", flush=True)
            row[graph] = collective_bytes(build(mesh))
        results[axis] = row
    print(json.dumps(results, indent=2))
    # per-chip wire traffic per step
    print("\nper-chip wire traffic (2-way axis, MB):")
    for axis, row in results.items():
        for graph, cols in row.items():
            mb = sum(WIRE_FACTOR[k] * b for k, (c, b) in cols.items()) / 1e6
            ops = sum(c for c, _ in cols.values())
            print(f"  {axis:8s} {graph:5s}: {mb:10.2f} MB in {ops} collectives")


if __name__ == "__main__":
    main()
