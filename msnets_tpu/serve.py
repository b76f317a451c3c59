"""Production serving: shape-bucketed, AOT-compiled stereo inference.

The reference has no serving story — its test loop (main_msnet.py:533-648)
re-pads every frame to a multiple of 32 and would recompile a CUDA graph per
unique shape. On TPU, compilation is the dominant first-request cost
(~20-40 s per shape through XLA), so a server must make shapes a *closed
set*: frames are padded up to one of a few SHAPE BUCKETS, each compiled once
(optionally ahead of time), and the result is cropped back.

Two bucketing modes:

* **exact** (default, `buckets=None`): every frame is padded to its minimal
  multiple-of-encoder_ds shape — bit-identical to the reference test path
  (cbmv_generator.py:780-788) — and that shape is cached as a compiled
  bucket. Production streams have fixed camera resolutions, so the shape
  set stays closed after the first frame per stream.
* **explicit buckets**: mixed-resolution streams can amortize compiles by
  padding up to a configured bucket. This is NOT numerically identical to
  minimal padding: the padded band's *features* are non-zero (the AML of a
  zero image region is a uniform likelihood, census/NCC normalizations are
  non-zero), so outputs within the regularizer's receptive field of the
  top/right boundary shift slightly — same class of boundary effect the
  reference's own pad-to-32 already has, just a thicker band. Use exact
  mode when parity matters more than compile count.

Throughput comes from pipelining: JAX dispatch is async, so the server keeps
up to `depth` frames in flight — the host pads/feeds frame k+1 while the
device runs frame k, and a fetcher thread blocks on device->host reads. On
the axon relay (~35 ms/dispatch) this hides most of the relay latency; on a
local chip it hides host prep entirely.

Usage:
    server = StereoServer(cfg, variables)      # or .from_checkpoint(...)
    server.warmup()                            # compile all buckets
    disp = server.predict(iml, imr)            # one frame, blocking
    for d in server.predict_stream(pairs):     # pipelined stream
        ...
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .config import Config

# Production shapes (PERF.md): bench 256x512, KITTI cross-val 384x1248,
# Middlebury/ETH3D 576x960. All multiples of encoder_ds=32. Opt-in — the
# default serving mode is exact per-shape padding (see module docstring).
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (256, 512), (384, 1248), (576, 960))


def exact_bucket(h: int, w: int, encoder_ds: int = 32) -> Tuple[int, int]:
    """Minimal pad-to-multiple-of-encoder_ds shape (reference parity)."""
    ch = h + (encoder_ds - h % encoder_ds) % encoder_ds
    cw = w + (encoder_ds - w % encoder_ds) % encoder_ds
    return (ch, cw)


def pick_bucket(h: int, w: int,
                buckets: Optional[Sequence[Tuple[int, int]]],
                encoder_ds: int = 32) -> Tuple[int, int]:
    """Smallest-area configured bucket covering (h, w); exact
    pad-to-multiple shape when buckets is None/empty or none covers (that
    shape then becomes a new compiled bucket)."""
    fits = [b for b in (buckets or ()) if b[0] >= h and b[1] >= w]
    if fits:
        return min(fits, key=lambda b: b[0] * b[1])
    return exact_bucket(h, w, encoder_ds)


def pad_to_bucket(iml: np.ndarray, imr: np.ndarray,
                  bucket: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad a uint8 pair on TOP and RIGHT to the bucket shape
    (generate_test_cbmv convention, cbmv_generator.py:780-788)."""
    h, w = iml.shape
    ph, pw = bucket[0] - h, bucket[1] - w
    assert ph >= 0 and pw >= 0, (iml.shape, bucket)
    pad = ((ph, 0), (0, pw))
    return np.pad(iml, pad), np.pad(imr, pad)


class StereoServer:
    """Shape-bucketed stereo-disparity inference server (one process,
    one device or one sharded mesh).

    Thread-safe for concurrent `predict` callers; `predict_stream` is the
    pipelined bulk path.
    """

    def __init__(self, cfg: Config, variables: Dict,
                 buckets: Optional[Sequence[Tuple[int, int]]] = None,
                 mesh=None, depth: int = 2):
        import jax

        self.cfg = cfg
        self.buckets = tuple(tuple(b) for b in buckets) if buckets else None
        self.mesh = mesh
        self.depth = max(1, depth)
        self._lock = threading.Lock()
        self._build_locks: Dict[Tuple[int, int], threading.Lock] = {}
        self._fns: Dict[Tuple[int, int], object] = {}
        self._stats = {"frames": 0, "compiles": 0, "bucket_hits": {}}

        from .models import build_model
        from .parallel import mesh as pm
        self.model = build_model(cfg.model)
        keep = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
        # static int8 configs need the calibrated per-layer scales; dropping
        # them would make every static conv read a missing collection (or,
        # with zeros, NaN-poison the output — layers.py static guard). The
        # server has no calibration pass of its own: calibrate via the
        # Evaluator (or one calib-mode forward) and pass quant_stats in.
        static_quant = (getattr(cfg.model, "quant_eval", False)
                        and getattr(cfg.model, "quant_mode", "dynamic")
                        == "static")
        qs = variables.get("quant_stats")
        if qs is not None:
            import jax.tree_util as jtu
            leaves = jtu.tree_leaves_with_path(qs)
            zero = [jtu.keystr(p) for p, v in leaves
                    if not np.any(np.asarray(v))]
            if len(zero) == len(leaves):
                # init-fresh collection: every scale would be 0 -> NaN
                # poison (layers.py static guard). Treat as uncalibrated.
                qs = None
            elif zero and static_quant:
                raise ValueError(
                    "StereoServer: quant_stats has zero (uncalibrated) "
                    f"absmax for layers {zero} — calibrate on a more "
                    "representative frame or disable quant_eval")
        if qs is not None:
            keep["quant_stats"] = qs
        elif static_quant:
            raise ValueError(
                "StereoServer: quant_mode='static' needs calibrated "
                "quant_stats in `variables` (run one quant_mode='calib' "
                "forward, or Evaluator auto-calibration, first)")
        variables = keep
        # Pin the weights on-device ONCE: host-resident (numpy) variables
        # re-upload ~11 MB per predict() call. Measured impact
        # (scripts/perf_serve.py, KITTI shape through the axon relay):
        # pipelined serving runs at 108.5 ms/frame = 94% of the 102 ms pure
        # device time; the unpipelined blocking path is relay-round-trip
        # dominated either way (seconds/frame, high variance) — use
        # predict_stream for throughput.
        if mesh is not None:
            self.variables = jax.device_put(variables,
                                            pm.shard(mesh, pm.REPLICATED))
        else:
            self.variables = jax.device_put(variables)
        self._jax = jax

    @classmethod
    def from_checkpoint(cls, cfg: Config, path: str, **kw) -> "StereoServer":
        """Build from a framework msgpack checkpoint or a reference torch
        .tar (same dual-format path the CLI test mode uses)."""
        from .engine import Trainer
        tr = Trainer(cfg, mesh=None)
        state = tr.init_state(tr.feats_shape_for(1), seed=0)
        state = tr.resume(state, path)
        return cls(cfg, {"params": state.params,
                         "batch_stats": state.batch_stats}, **kw)

    # -- compilation ------------------------------------------------------

    def _build(self, bucket: Tuple[int, int]):
        """jit (and compile) the full device path for one bucket shape."""
        import jax
        import jax.numpy as jnp
        from .ops.features import ms_features_test
        from .parallel import mesh as pm

        mcfg = self.cfg.matching
        max_disp = self.cfg.model.max_disp
        model, mesh = self.model, self.mesh
        fdt = jnp.bfloat16 if self.cfg.model.compute_dtype == "bfloat16" \
            else jnp.float32

        def fwd(variables, a, b):
            f = ms_features_test(a, b, max_disp, mcfg, mcfg.left_only, fdt)
            f = f[None]
            if mesh is not None:
                f = jax.lax.with_sharding_constraint(
                    f, pm.shard(mesh, pm.VOLUME))
            with pm.active_mesh(mesh):
                return model.apply(variables, f, train=False)

        fn = jax.jit(fwd)
        # AOT-compile now so the first request doesn't pay it
        dummy = jnp.zeros(bucket, jnp.uint8)
        return fn.lower(self.variables, dummy, dummy).compile()

    def _fn_for(self, bucket: Tuple[int, int]):
        # per-bucket build lock: concurrent predict() calls for the same
        # uncached shape must not each pay the 20-40 s compile
        with self._lock:
            fn = self._fns.get(bucket)
            if fn is not None:
                return fn
            bl = self._build_locks.setdefault(bucket, threading.Lock())
        with bl:
            with self._lock:
                fn = self._fns.get(bucket)
            if fn is None:
                fn = self._build(bucket)
                with self._lock:
                    self._fns[bucket] = fn
                    self._stats["compiles"] += 1
        return fn

    def warmup(self, shapes: Sequence[Tuple[int, int]] = ()) -> None:
        """Compile every configured bucket up front; in exact mode pass the
        expected frame shapes instead (each compiles its minimal pad)."""
        for b in self.buckets or ():
            self._fn_for(b)
        for h, w in shapes:
            self._fn_for(pick_bucket(h, w, self.buckets,
                                     self.cfg.model.encoder_ds))

    # -- inference --------------------------------------------------------

    def _dispatch(self, iml: np.ndarray, imr: np.ndarray):
        """Pad, pick bucket, enqueue on device. Returns (device_out, h, w,
        bucket) without waiting for execution."""
        import jax.numpy as jnp
        h, w = iml.shape
        bucket = pick_bucket(h, w, self.buckets,
                             self.cfg.model.encoder_ds)
        il, ir = pad_to_bucket(iml, imr, bucket)
        fn = self._fn_for(bucket)
        out = fn(self.variables, jnp.asarray(il), jnp.asarray(ir))
        with self._lock:
            self._stats["frames"] += 1
            hits = self._stats["bucket_hits"]
            hits[bucket] = hits.get(bucket, 0) + 1
        return out, h, w, bucket

    @staticmethod
    def _fetch(out, h: int, w: int, bucket: Tuple[int, int]) -> np.ndarray:
        disp = np.asarray(out)[0]                     # [bh, bw]
        return np.ascontiguousarray(
            disp[bucket[0] - h:bucket[0], :w].astype(np.float32))

    def predict(self, iml: np.ndarray, imr: np.ndarray) -> np.ndarray:
        """One frame, blocking: uint8 [H, W] pair -> float32 [H, W]
        disparity (original resolution, padding cropped)."""
        return self._fetch(*self._dispatch(iml, imr))

    def predict_stream(self, pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
                       ) -> Iterator[np.ndarray]:
        """Pipelined bulk inference: keeps up to `depth` frames in flight.

        The generator yields disparities in input order. Host-side padding
        of frame k+1 overlaps device execution of frame k; a fetcher thread
        owns the blocking device->host reads.
        """
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        results: "queue.Queue" = queue.Queue()
        DONE = object()

        def fetcher():
            # The fetcher NEVER stops draining q on an item error — a
            # per-item exception becomes that item's result and the loop
            # continues. If it returned instead, a producer parked inside
            # the blocking q.put would deadlock with no consumer left.
            while True:
                item = q.get()
                if item is DONE:
                    results.put(DONE)
                    return
                try:
                    results.put(self._fetch(*item))
                except Exception as e:                # surface to consumer
                    results.put(e)

        t = threading.Thread(target=fetcher, daemon=True)
        t.start()
        pending = 0
        pairs_it = iter(pairs)

        def drain_one():
            r = results.get()
            if isinstance(r, Exception):
                raise r
            return r

        try:
            for iml, imr in pairs_it:
                q.put(self._dispatch(iml, imr))
                pending += 1
                # opportunistically yield finished frames to bound memory
                while pending > self.depth and not results.empty():
                    yield drain_one()
                    pending -= 1
            while pending:
                yield drain_one()
                pending -= 1
        finally:
            # always runs — normal end, consumer error, OR the consumer
            # abandoning the generator (GeneratorExit): shut the fetcher
            # down and drain stragglers so no thread or in-flight device
            # buffer outlives the stream.
            q.put(DONE)
            while results.get() is not DONE:
                pass
            t.join()

    # -- introspection ----------------------------------------------------

    def stats(self) -> Dict:
        with self._lock:
            s = dict(self._stats)
            s["bucket_hits"] = dict(s["bucket_hits"])
            s["compiled_buckets"] = sorted(self._fns)
        return s


# (throughput probing lives in scripts/perf_serve.py, which also A/Bs the
# blocking path against the pipelined one)
