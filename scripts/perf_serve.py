"""Serving-path throughput on the real chip: blocking predict() vs the
pipelined predict_stream() at KITTI-native frame size.

Wall-clock here includes host padding, the relay dispatch (~35 ms/call on
axon) and the device->host disparity fetch — i.e. what a deployment
actually gets, unlike bench.py's pure device time. The pipelined path keeps
`depth` frames in flight so host prep + relay latency overlap device
execution.

Usage: python scripts/perf_serve.py [n_frames] [depth]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from msnets_tpu.config import Config, MatchingConfig, ModelConfig
from msnets_tpu.serve import StereoServer


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shape = (375, 1242)          # KITTI native -> exact bucket (384, 1248)

    import jax
    cfg = Config(model=ModelConfig(name="MS-GCNet", max_disp=192),
                 matching=MatchingConfig())
    from msnets_tpu.models import build_model
    import jax.numpy as jnp
    model = build_model(cfg.model)
    fs = (1, 96, 16, 32, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(fs, jnp.float32), train=False)
    sv = StereoServer(cfg, variables, depth=depth)

    rng = np.random.default_rng(0)
    pairs = [(rng.integers(0, 256, shape, dtype=np.uint8),
              rng.integers(0, 256, shape, dtype=np.uint8))
             for _ in range(min(n, 8))]

    print(f"[serve] warmup/compile bucket for {shape} ...", flush=True)
    t0 = time.perf_counter()
    sv.warmup(shapes=[shape])
    print(f"[serve] compiled in {time.perf_counter() - t0:.1f} s", flush=True)

    # relay-health guard: wall-clock serving numbers are meaningless on a
    # degraded relay day (round 3 measured 127.4 vs 96.5 ms/frame with
    # identical code — the relay, not the path; PERF.md). Probe dispatch
    # latency first and annotate every result with it.
    from msnets_tpu.utils.profiling import NOMINAL_DISPATCH_MS, relay_health
    disp_ms, healthy = relay_health()
    print(f"[serve] relay dispatch latency: {disp_ms:.1f} ms "
          f"(nominal ~{NOMINAL_DISPATCH_MS:.0f}; "
          f"{'healthy' if healthy else 'DEGRADED'})", flush=True)

    # blocking: one frame at a time, full round-trip each
    t0 = time.perf_counter()
    for i in range(n):
        sv.predict(*pairs[i % len(pairs)])
    dt_block = time.perf_counter() - t0

    # pipelined
    t0 = time.perf_counter()
    for _ in sv.predict_stream(pairs[i % len(pairs)] for i in range(n)):
        pass
    dt_pipe = time.perf_counter() - t0

    print(f"[serve] {shape} x {n} frames  "
          f"[relay dispatch {disp_ms:.1f} ms]")
    print(f"  blocking: {1e3 * dt_block / n:7.1f} ms/frame = "
          f"{n / dt_block:5.2f} fps")
    if healthy:
        print(f"  pipelined (depth={depth}): {1e3 * dt_pipe / n:7.1f} "
              f"ms/frame = {n / dt_pipe:5.2f} fps")
    else:
        print(f"  pipelined (depth={depth}): [NOT A HEADLINE NUMBER — relay "
              f"degraded at {disp_ms:.1f} ms dispatch, > 2x nominal; raw: "
              f"{1e3 * dt_pipe / n:.1f} ms/frame]")
    print(f"  stats: {sv.stats()}")


if __name__ == "__main__":
    main()
