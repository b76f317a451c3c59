"""Parity tests for models/basic_blocks.py vs straightforward NumPy loops
replicating reference src/models/basic_convs.py semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from msnets_tpu.models.basic_blocks import (ConvBlock2D, UpconvBlock2D,
                                            corr1d, correlation1d_map)


def _np_correlation1d(x, y, maxdisp):
    """basic_convs.py:20-66: zero-padded shifted product-sum."""
    N, H, W, C = x.shape
    out = np.zeros((N, maxdisp, H, W), np.float32)
    for d in range(maxdisp):
        for j in range(W):
            if j - d >= 0:
                out[:, d, :, j] = np.sum(x[:, :, j] * y[:, :, j - d], -1)
    return out


def test_correlation1d_map_matches_loop():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 10, 4), dtype=np.float32)
    y = rng.standard_normal((2, 6, 10, 4), dtype=np.float32)
    got = np.asarray(correlation1d_map(jnp.asarray(x), jnp.asarray(y), 5))
    np.testing.assert_allclose(got, _np_correlation1d(x, y, 5),
                               rtol=1e-5, atol=1e-5)


def test_corr1d_zero_fill_and_stride():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 8, 3), dtype=np.float32)
    y = rng.standard_normal((1, 4, 8, 3), dtype=np.float32)
    got = np.asarray(corr1d(jnp.asarray(x), jnp.asarray(y), D=4, stride=2))
    # channel i correlates at shift 2*i; cols < 2*i stay zero
    for i in range(4):
        s = 2 * i
        ref = np.zeros((1, 4, 8), np.float32)
        if s < 8:
            ref[:, :, s:] = np.sum(x[:, :, s:] * y[:, :, :8 - s if s else 8],
                                   -1)
        np.testing.assert_allclose(got[:, i], ref, rtol=1e-5, atol=1e-5)


def test_corr1d_avgpool_smoothing():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, 7, 2), dtype=np.float32)
    y = rng.standard_normal((1, 5, 7, 2), dtype=np.float32)
    raw = np.asarray(corr1d(jnp.asarray(x), jnp.asarray(y), D=3))
    sm = np.asarray(corr1d(jnp.asarray(x), jnp.asarray(y), D=3,
                           kernel_size=3))
    # centre pixel = mean of the 3x3 zero-padded neighborhood
    ref = np.mean(raw[0, 1, 1:4, 2:5])
    np.testing.assert_allclose(sm[0, 1, 2, 3], ref, rtol=1e-5)


def test_conv_block_shapes_and_bn():
    m = ConvBlock2D(features=8, kernel=3, stride=2)
    x = jnp.ones((2, 16, 20, 4))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 8, 10, 8)
    assert (np.asarray(y) >= 0).all()                 # relu
    assert upd["batch_stats"]


def test_upconv_blocks_double_hw():
    for k in (3, 4):
        m = UpconvBlock2D(features=6, kernel=k)
        x = jnp.ones((1, 7, 9, 4))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 14, 18, 6), (k, y.shape)


def test_upconv_no_bn_has_bias():
    m = UpconvBlock2D(features=3, kernel=4, use_bn=False, use_relu=False)
    x = jnp.zeros((1, 4, 4, 2))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert "bias" in v["params"]
