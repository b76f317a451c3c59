"""Feature-pipeline tests: downsample + normalization + AML assembly."""
import numpy as np
import jax.numpy as jnp
import pytest

from msnets_tpu.config import MatchingConfig
from msnets_tpu.ops import features as F
from msnets_tpu.ops import oracle_np as O


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(7)
    H, W = 30, 64
    return (rng.integers(0, 256, (H, W), dtype=np.uint8),
            rng.integers(0, 256, (H, W), dtype=np.uint8))


@pytest.mark.parametrize("shape", [(36, 52), (37, 53), (64, 128),
                                   (375, 1242), (7, 11)])  # dims ≡ 3 (mod 4):
                                   # KITTI-native H; host twin must zero-pad like the device
def test_downsample_half_matches_host(shape):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dev = np.asarray(F.downsample_half(jnp.asarray(img)))
    host = F.downsample_half_np(img)
    assert dev.shape == host.shape == (round(shape[0] * 0.5), round(shape[1] * 0.5))
    # device is float32, host float64: allow off-by-one on rounding boundaries
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1


def test_feature_assembly_matches_oracle(pair):
    iml, imr = pair
    cfg = MatchingConfig()
    D = 16
    ref_costs = O.get_costs(iml, imr, D, 11, 3, 5, 5,
                            board_h=5, board_w_left=6, board_w_right=0)
    ref = O.extract_features_left(*ref_costs)  # [8, D, H', W']
    got = np.asarray(F.ms_features(jnp.asarray(iml), jnp.asarray(imr), D, cfg,
                                   5, 6, 0, True))  # [D, H', W', 8]
    got = np.transpose(got, (3, 0, 1, 2))
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=5e-6)


def test_feature_values_bounded(pair):
    iml, imr = pair
    cfg = MatchingConfig()
    f = np.asarray(F.ms_features(jnp.asarray(iml), jnp.asarray(imr), 16, cfg, 5, 6))
    assert f.min() >= 0.0 and f.max() <= 1.0
    assert f.dtype == np.float32


def test_feature_lr_16ch(pair):
    iml, imr = pair
    cfg = MatchingConfig()
    f = np.asarray(F.ms_features(jnp.asarray(iml), jnp.asarray(imr), 8, cfg,
                                 5, 6, 0, False))
    assert f.shape[-1] == 16
    # left half must equal the left-only features
    fl = np.asarray(F.ms_features(jnp.asarray(iml), jnp.asarray(imr), 8, cfg, 5, 6))
    np.testing.assert_array_equal(f[..., :8], fl)
    # out_dtype is honored on the L+R path too (it was silently dropped)
    fb = F.ms_features(jnp.asarray(iml), jnp.asarray(imr), 8, cfg,
                       5, 6, 0, False, jnp.bfloat16)
    assert fb.dtype == jnp.bfloat16 and fb.shape[-1] == 16


def test_train_feature_stage_shapes(pair):
    """ms_features_train: crop+margins in, half-res trimmed features out."""
    cfg = MatchingConfig()
    rng = np.random.default_rng(13)
    crop_h, crop_w, maxdisp = 64, 128, 32
    bh, bwl = cfg.board_h, maxdisp
    iml = rng.integers(0, 256, (crop_h + 2 * bh, crop_w + bwl), dtype=np.uint8)
    imr = rng.integers(0, 256, (crop_h + 2 * bh, crop_w + bwl), dtype=np.uint8)
    f = F.ms_features_train(jnp.asarray(iml), jnp.asarray(imr), maxdisp, cfg, bh, bwl)
    # [D/2, H/2, W/2, 8]
    assert f.shape == (maxdisp // 2, crop_h // 2, crop_w // 2, 8)


def test_layout_adapters():
    x = jnp.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
    y = F.to_ncdhw(x)
    assert y.shape == (5, 2, 3, 4)
    np.testing.assert_array_equal(np.asarray(F.from_ncdhw(y)), np.asarray(x))
