"""Mesh-scaling validation: the full train step over growing meshes.

Multi-chip TPU hardware is not reachable from this container, so this runs
on virtual CPU devices (--xla_force_host_platform_device_count). It validates
that every mesh layout compiles, executes, and keeps per-replica batch work
constant (weak scaling), and prints step times — a *mechanical* scaling
check, not a hardware throughput claim. On a real pod slice the same code
path measures true scaling efficiency (pairs/sec at 1 chip / 1 host /
N hosts, BASELINE.json).

Usage: python scripts/bench_scaling.py [ndevices ...]
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from msnets_tpu.config import (Config, DataConfig, MatchingConfig,
                                   ModelConfig, TrainConfig)
    from msnets_tpu.engine import Trainer
    from msnets_tpu.parallel import mesh as pm

    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    results = {}
    for n in sizes:
        mesh = pm.make_mesh(devices=jax.devices()[:n])
        data_ax = mesh.devices.shape[0]
        mcfg = MatchingConfig(board_h=4)
        cfg = Config(
            matching=mcfg,
            model=ModelConfig(name="MS-GCNet", max_disp=32, base_filters=8,
                              compute_dtype="float32"),
            train=TrainConfig(crop_height=64, crop_width=128,
                              batch_size=2 * data_ax, remat=False),
            data=DataConfig())
        tr = Trainer(cfg, mesh=mesh)
        with mesh:
            state = tr.init_state(tr.feats_shape_for(cfg.train.batch_size))
            rng = np.random.default_rng(0)
            bh, bwl = mcfg.board_h, cfg.model.max_disp
            shp = (cfg.train.batch_size, cfg.train.crop_height + 2 * bh,
                   cfg.train.crop_width + bwl)
            iml = jnp.asarray(rng.integers(0, 256, shp, dtype=np.uint8))
            imr = jnp.asarray(rng.integers(0, 256, shp, dtype=np.uint8))
            disp = jnp.asarray(np.full((cfg.train.batch_size, 64, 128), 8.0,
                                       np.float32))
            lr = jnp.asarray(1e-3, jnp.float32)
            fn = tr.step_fn(bh, bwl, 0)
            state, m, _ = fn(state, iml, imr, disp, lr)
            _ = float(m["loss"])
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, m, _ = fn(state, iml, imr, disp, lr)
                _ = float(m["loss"])
                times.append(time.perf_counter() - t0)
            results[n] = {"mesh": dict(zip(pm.AXES, mesh.devices.shape)),
                          "batch": cfg.train.batch_size,
                          "step_sec": min(times),
                          "pairs_per_sec": cfg.train.batch_size / min(times)}
            print(f"devices={n} mesh={results[n]['mesh']} "
                  f"batch={results[n]['batch']} "
                  f"step={results[n]['step_sec']*1e3:.0f}ms "
                  f"{results[n]['pairs_per_sec']:.2f} pairs/s")
    print(json.dumps({"scaling_validation": results, "backend": "cpu-virtual"}))


if __name__ == "__main__":
    main()
