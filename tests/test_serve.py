"""Serving subsystem: bucket selection, exactness of bucket padding,
compile caching, pipelined stream ordering."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msnets_tpu.config import (Config, DataConfig, EvalConfig, MatchingConfig,
                               ModelConfig, TrainConfig)
from msnets_tpu.serve import (StereoServer, pick_bucket, pad_to_bucket,
                              DEFAULT_BUCKETS)


def _small_cfg(max_disp=32):
    return Config(model=ModelConfig(name="MS-GCNet", max_disp=max_disp,
                                    compute_dtype="float32"),
                  matching=MatchingConfig())


def _server(buckets, max_disp=32):
    cfg = _small_cfg(max_disp)
    from msnets_tpu.models import build_model
    model = build_model(cfg.model)
    fs = (1, max_disp // 2, 16, 32, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(fs, jnp.float32), train=False)
    return StereoServer(cfg, variables, buckets=buckets)


@pytest.mark.slow
def test_server_static_quant_needs_calibrated_scales():
    """quant_mode='static' without quant_stats must fail LOUDLY at server
    construction (not silently saturate); with calibrated stats it serves."""
    import dataclasses
    cfg = _small_cfg()
    qcfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_eval=True, quant_mode="static"))
    from msnets_tpu.models import build_model
    model = build_model(cfg.model)
    fs = (1, 16, 16, 32, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(fs, jnp.float32), train=False)
    with pytest.raises(ValueError, match="quant_stats"):
        StereoServer(qcfg, variables)
    # an init-fresh ALL-ZERO quant_stats is equally uncalibrated (static
    # scales of 0 would NaN-poison every output) -> same loud failure
    qvars = build_model(qcfg.model).init(
        jax.random.PRNGKey(0), jnp.zeros(fs, jnp.float32), train=False)
    assert "quant_stats" in qvars
    with pytest.raises(ValueError, match="quant_stats"):
        StereoServer(qcfg, qvars)
    # calibrate with one calib-mode forward, then the server accepts it
    calib_model = build_model(dataclasses.replace(
        qcfg.model, quant_mode="calib"))
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal(fs), jnp.float32)
    _, qs = calib_model.apply(variables, f, train=False,
                              mutable=["quant_stats"])
    srv = StereoServer(qcfg, dict(variables, **qs))
    iml = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    d = srv.predict(iml, iml)
    assert d.shape == (32, 64) and np.isfinite(d).all()


def test_pick_bucket():
    assert pick_bucket(375, 1242, DEFAULT_BUCKETS) == (384, 1248)
    assert pick_bucket(240, 400, DEFAULT_BUCKETS) == (256, 512)
    assert pick_bucket(540, 960, DEFAULT_BUCKETS) == (576, 960)
    # nothing covers -> exact pad-to-32 becomes a new bucket
    assert pick_bucket(600, 1250, DEFAULT_BUCKETS) == (608, 1280)
    # smallest-area preference among the buckets that fit
    assert pick_bucket(100, 600, DEFAULT_BUCKETS) == (384, 1248)


def test_pad_to_bucket_convention():
    iml = np.arange(6, dtype=np.uint8).reshape(2, 3)
    il, ir = pad_to_bucket(iml, iml, (4, 5))
    assert il.shape == (4, 5)
    # top + right zero padding (cbmv_generator.py:780-788 convention)
    np.testing.assert_array_equal(il[:2], 0)
    np.testing.assert_array_equal(il[2:, :3], iml)
    np.testing.assert_array_equal(il[:, 3:], 0)


@pytest.mark.slow
def test_exact_mode_matches_reference_padding():
    """Exact mode (buckets=None) must reproduce the minimal pad-to-32
    path bit-for-bit: pick_bucket returns the exact_bucket shape, so the
    served result equals serving through a bucket of exactly that shape."""
    rng = np.random.default_rng(0)
    h, w = 56, 120
    iml = rng.integers(0, 256, (h, w), dtype=np.uint8)
    imr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    sv_exact = _server(buckets=None)
    sv_min = _server(buckets=[(64, 128)])       # == exact_bucket(56, 120)
    d_exact = sv_exact.predict(iml, imr)
    d_min = sv_min.predict(iml, imr)
    assert d_exact.shape == (h, w)
    np.testing.assert_array_equal(d_exact, d_min)
    assert sv_exact.stats()["compiled_buckets"] == [(64, 128)]


def test_bucket_padding_is_approximate_but_close():
    """Serving through a LARGER bucket is documented as approximate: the
    padded band's matching features are non-zero (AML of a flat region is
    uniform), so outputs shift slightly within the regularizer's receptive
    field of the top/right edge. Bound the drift on a random-init model."""
    rng = np.random.default_rng(0)
    h, w = 56, 120
    iml = rng.integers(0, 256, (h, w), dtype=np.uint8)
    imr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    d_min = _server(buckets=[(64, 128)]).predict(iml, imr)
    d_big = _server(buckets=[(96, 160)]).predict(iml, imr)
    assert d_min.shape == (h, w) and d_big.shape == (h, w)
    # same disparity field to ~2-3% — close, but intentionally not exact
    rel = np.abs(d_big - d_min) / np.maximum(np.abs(d_min), 1.0)
    assert np.median(rel) < 0.02 and rel.max() < 0.15


def test_compile_cache_and_stats():
    sv = _server(buckets=[(64, 128)])
    rng = np.random.default_rng(1)
    for shape in [(64, 128), (50, 100), (60, 120)]:
        iml = rng.integers(0, 256, shape, dtype=np.uint8)
        sv.predict(iml, iml)
    s = sv.stats()
    assert s["frames"] == 3
    assert s["compiles"] == 1          # one bucket covers all three
    assert s["bucket_hits"] == {(64, 128): 3}
    # out-of-bucket shape triggers exactly one new compile
    iml = rng.integers(0, 256, (96, 160), dtype=np.uint8)
    sv.predict(iml, iml)
    assert sv.stats()["compiles"] == 2


def test_predict_stream_order_and_values():
    sv = _server(buckets=[(64, 128)])
    rng = np.random.default_rng(2)
    pairs = [(rng.integers(0, 256, (64, 128), dtype=np.uint8),
              rng.integers(0, 256, (64, 128), dtype=np.uint8))
             for _ in range(5)]
    got = list(sv.predict_stream(iter(pairs)))
    assert len(got) == 5
    for (iml, imr), d in zip(pairs, got):
        np.testing.assert_allclose(d, sv.predict(iml, imr),
                                   rtol=1e-5, atol=1e-5)


def test_warmup_compiles_all_buckets():
    sv = _server(buckets=[(64, 128), (96, 160)])
    sv.warmup()
    s = sv.stats()
    assert s["compiles"] == 2 and s["frames"] == 0
    assert s["compiled_buckets"] == [(64, 128), (96, 160)]


def test_serve_sharded_mesh_matches_unsharded():
    """StereoServer over a (data,spatial,disp) mesh must produce the same
    disparities as the single-device server (GSPMD halo exchange +
    disparity-axis reductions are numerics-preserving)."""
    from msnets_tpu.parallel import mesh as pm
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _small_cfg()
    from msnets_tpu.models import build_model
    model = build_model(cfg.model)
    fs = (1, cfg.model.max_disp // 2, 16, 32, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(fs, jnp.float32), train=False)
    mesh = pm.make_mesh((1, 2, 2), devices=jax.devices()[:4])
    rng = np.random.default_rng(3)
    iml = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    imr = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    d0 = StereoServer(cfg, variables).predict(iml, imr)
    d1 = StereoServer(cfg, variables, mesh=mesh).predict(iml, imr)
    np.testing.assert_allclose(d1, d0, rtol=2e-4, atol=2e-4)


def test_serve_psmnet_smoke():
    """The serving surface supports the second model family: a
    MS-PSMNet StereoServer predicts a sane disparity map (shape, range,
    finiteness) through the same bucket/pad/unpad path."""
    cfg = Config(model=ModelConfig(name="MS-PSMNet", max_disp=32,
                                   base_filters=8,
                                   compute_dtype="float32"),
                 matching=MatchingConfig())
    from msnets_tpu.models import build_model
    model = build_model(cfg.model)
    fs = (1, 16, 16, 32, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(fs, jnp.float32), train=False)
    srv = StereoServer(cfg, variables)
    rng = np.random.default_rng(0)
    iml = rng.integers(0, 256, (48, 96), dtype=np.uint8)
    imr = rng.integers(0, 256, (48, 96), dtype=np.uint8)
    d = np.asarray(srv.predict(iml, imr))
    assert d.shape == (48, 96)
    assert np.isfinite(d).all() and d.min() >= 0 and d.max() <= 32
