"""Data-layer tests: PFM I/O, resolvers, crop geometry, pipelines."""
import numpy as np
import pytest

from msnets_tpu.config import DataConfig, MatchingConfig
from msnets_tpu.data import pfm as pfmio
from msnets_tpu.data import pipeline as P
from msnets_tpu.data import resolvers as R


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((17, 23)) * 100).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    pfmio.write_pfm(p, img)
    back = pfmio.read_pfm(p)
    np.testing.assert_array_equal(img, back)


def test_pfm_color_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((9, 11, 3)).astype(np.float32)
    p = str(tmp_path / "c.pfm")
    pfmio.write_pfm(p, img)
    np.testing.assert_array_equal(img, pfmio.read_pfm(p))


def test_sceneflow_resolver():
    entry = "FlyingThings3D/frames_finalpass/TRAIN/A/0000/left/0006.png"
    l, r, d = R.resolve_sceneflow("/data", entry)
    assert l == "/data/" + entry
    assert r == "/data/FlyingThings3D/frames_finalpass/TRAIN/A/0000/right/0006.png"
    assert d == "/data/FlyingThings3D/disparity/TRAIN/A/0000/left/0006.pfm"
    # cleanpass swap
    l2, _, _ = R.resolve_sceneflow("/data", entry, cleanpass=True)
    assert "frames_cleanpass" in l2


def test_kitti_eth_resolvers():
    l, r, d = R.resolve_kitti2015("/k", "000001_10.png")
    assert (l, r, d) == ("/k/image_0/000001_10.png", "/k/image_1/000001_10.png",
                        "/k/disp_occ_0_pfm/000001_10.pfm")
    l, r, d = R.resolve_eth3d("/e", "delivery_area_1l")
    assert d == "/e/delivery_area_1l/disp0GT.pfm"


def test_crop_position_margins():
    rng = np.random.default_rng(0)
    for _ in range(50):
        sw, sh, fw, fh, bwl, bwr = P.crop_position(
            960, 540, 512, 256, 192, 0, 12, rng)
        assert fw - sw == 512 + 192 and fh - sh == 256 + 24
        assert 0 <= sw and fw <= 960 and 0 <= sh and fh <= 540


def test_crop_position_narrow_image_halves_margins():
    """ETH3D-style narrow images halve the margins (cbmv_generator.py:409-419)."""
    rng = np.random.default_rng(0)
    sw, sh, fw, fh, bwl, bwr = P.crop_position(700, 480, 512, 256, 192, 0, 12, rng)
    assert bwl == 96 and fw - sw == 512 + 96


def test_crop_position_fixed_center_deterministic():
    a = P.crop_position(960, 540, 512, 256, 192, 0, 12, None, fixed_center=True)
    b = P.crop_position(960, 540, 512, 256, 192, 0, 12, None, fixed_center=True)
    assert a == b


def test_crop_position_too_narrow_raises():
    with pytest.raises(ValueError):
        P.crop_position(100, 480, 512, 256, 192, 0, 12, np.random.default_rng(0))


def test_dummy_sample_shapes():
    cfg = MatchingConfig()
    s = P.make_dummy_train_sample(256, 512, 192, cfg)
    assert s.iml.shape == (256 + 24, 512 + 192)
    assert s.disp.shape == (256, 512)
    assert (s.disp == 64.0).all()
    assert s.left_rgb.shape == (3, 256, 512)


def test_test_sample_padding(tmp_path, monkeypatch):
    """Pad top+right to multiple of encoder_ds (cbmv_generator.py:780-788)."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (375, 1242), dtype=np.uint8)
    monkeypatch.setattr(P, "read_gray", lambda p: img)
    s = P.make_test_sample("l", "r", "d", "e", encoder_ds=32)
    assert (s.crop_height, s.crop_width) == (384, 1248)
    assert s.iml.shape == (384, 1248)
    # padding is at top and right; original content bottom-left
    np.testing.assert_array_equal(s.iml[384 - 375:, :1242], img)
    assert (s.iml[:384 - 375, :] == 0).all()
    assert (s.iml[:, 1242:] == 0).all()


def _write_synthetic_sf_tree(root, n=4, h=80, w=160):
    """Create a tiny on-disk Scene Flow layout + manifest for pipeline tests."""
    import cv2
    rng = np.random.default_rng(5)
    entries = []
    for i in range(n):
        base = rng.integers(0, 256, (h, w + 8), dtype=np.uint8)
        left = base[:, 8:]
        right = base[:, :w]
        disp = np.full((h, w), 8.0, np.float32)
        ldir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left"
        rdir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/right"
        ddir = root / f"FlyingThings3D/disparity/TRAIN/A/{i:04d}/left"
        for d in (ldir, rdir, ddir):
            d.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(ldir / "0006.png"), left)
        cv2.imwrite(str(rdir / "0006.png"), right)
        pfmio.write_pfm(str(ddir / "0006.pfm"), disp)
        entries.append(f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left/0006.png")
    lst = root / "train.list"
    lst.write_text("\n".join(entries) + "\n")
    return str(lst)


def test_train_pipeline_end_to_end(tmp_path):
    lst = _write_synthetic_sf_tree(tmp_path)
    dc = DataConfig(data_path=str(tmp_path), training_list=lst)
    mc = MatchingConfig(board_h=4)
    pipe = P.TrainPipeline(dc, mc, crop_h=32, crop_w=64, max_disp=16,
                           batch_size=2, seed=7, num_threads=2)
    batches = list(pipe.epoch(1))
    assert len(batches) == 2
    b = batches[0]
    assert b["iml"].shape == (2, 32 + 8, 64 + 16)
    assert b["disp"].shape == (2, 32, 64)
    assert b["left_rgb"].shape == (2, 3, 32, 64)
    # determinism: same epoch -> identical batches
    again = list(pipe.epoch(1))
    np.testing.assert_array_equal(b["iml"], again[0]["iml"])
    # different epoch -> different crops (with overwhelming probability)
    other = list(pipe.epoch(2))
    assert not np.array_equal(b["iml"], other[0]["iml"])


def test_host_sharding_equal_and_covers_across_epochs(tmp_path):
    """Per-host shards must be EQUAL length (uneven shards would leave one
    host running jitted steps whose collectives the others never enter),
    and the per-epoch permutation rotates which remainder entries drop, so
    a few epochs cover everything (the reference's contiguous split drops
    the SAME N mod workers files every epoch, dataset.py:349-357)."""
    lst = _write_synthetic_sf_tree(tmp_path, n=5)
    dc = DataConfig(data_path=str(tmp_path), training_list=lst)
    mc = MatchingConfig(board_h=4)
    pipes = [P.TrainPipeline(dc, mc, 32, 64, 16, batch_size=1, seed=7,
                             num_threads=1, num_hosts=2, host_id=h)
             for h in range(2)]
    seen = set()
    for epoch in range(4):
        counts = []
        for pipe in pipes:
            counts.append(len(list(pipe.epoch(epoch))))
            seen.update(pipe._epoch_entries)
        assert counts[0] == counts[1] == pipes[0].steps_per_epoch()
    assert len(seen) == 5  # rotation covers every entry within a few epochs


def test_map_dataset_matches_streamed_order(tmp_path):
    """Random-access MapDataset (reference DatasetFromList,
    dataset.py:124-215) returns exactly the sample the streamed pipeline
    places at the same position of the same epoch."""
    lst = _write_synthetic_sf_tree(tmp_path)
    dc = DataConfig(data_path=str(tmp_path), training_list=lst)
    mc = MatchingConfig(board_h=4)
    pipe = P.TrainPipeline(dc, mc, crop_h=32, crop_w=64, max_disp=16,
                           batch_size=1, seed=7, num_threads=2)
    ds = P.MapDataset(pipe, epoch=1)
    assert len(ds) == 4
    streamed = list(pipe.epoch(1))
    # access out of order on purpose
    for i in (3, 0, 2, 1):
        s = ds[i]
        np.testing.assert_array_equal(s.iml, streamed[i]["iml"][0])
        np.testing.assert_array_equal(s.disp, streamed[i]["disp"][0])
        np.testing.assert_array_equal(s.left_rgb, streamed[i]["left_rgb"][0])
    # (epoch, index) keys address any epoch; negative indices wrap
    s2 = ds[(2, 1)]
    streamed2 = list(pipe.epoch(2))
    np.testing.assert_array_equal(s2.iml, streamed2[1]["iml"][0])
    np.testing.assert_array_equal(ds[-1].iml, streamed[3]["iml"][0])
    with pytest.raises(IndexError):
        ds[4]


def test_resolve_rejects_unknown_dataset():
    import pytest
    from msnets_tpu.data import resolvers as R
    with pytest.raises(ValueError, match="unknown dataset"):
        R.resolve("kitti-2015", "/data", "foo.png")

def _write_mixed_width_tree(root):
    """4 wide (w=160) + 4 narrow (w=70) entries: the narrow images force
    crop_position's margin halving (cbmv_generator.py:409-419)."""
    import cv2
    rng = np.random.default_rng(6)
    entries = []
    for i, w in enumerate([160, 70, 160, 70, 160, 70, 160, 70]):
        h = 80
        base = rng.integers(0, 256, (h, w + 8), dtype=np.uint8)
        left, right = base[:, 8:], base[:, :w]
        disp = np.full((h, w), 8.0, np.float32)
        ldir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left"
        rdir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/right"
        ddir = root / f"FlyingThings3D/disparity/TRAIN/A/{i:04d}/left"
        for d in (ldir, rdir, ddir):
            d.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(ldir / "0006.png"), left)
        cv2.imwrite(str(rdir / "0006.png"), right)
        pfmio.write_pfm(str(ddir / "0006.pfm"), disp)
        entries.append(
            f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left/0006.png")
    lst = root / "train.list"
    lst.write_text("\n".join(entries) + "\n")
    return str(lst)


def test_geometry_bucketed_batching_mixed_widths(tmp_path):
    """Narrow (margin-halved, ETH3D-like) images batch at batch_size=2 with
    each other instead of asserting (VERDICT r3 item 7): the schedule groups
    samples by (board_h, bwl, bwr) and every yielded batch is
    single-geometry."""
    lst = _write_mixed_width_tree(tmp_path)
    dc = DataConfig(data_path=str(tmp_path), training_list=lst)
    mc = MatchingConfig(board_h=4)
    pipe = P.TrainPipeline(dc, mc, crop_h=32, crop_w=64, max_disp=16,
                           batch_size=2, seed=7, num_threads=2)
    # width 70: 70-64-16 < 0 -> bwl 8 (72>70) -> bwl 4 (68<=70) OK
    assert pipe.geometry_for_width(160) == (4, 16, 0)
    assert pipe.geometry_for_width(70) == (4, 4, 0)
    batches = list(pipe.epoch(1))
    assert len(batches) == 4            # 2 wide + 2 narrow, none dropped
    geoms = sorted((b["board_h"], b["board_w_left"], b["board_w_right"])
                   for b in batches)
    assert geoms == [(4, 4, 0), (4, 4, 0), (4, 16, 0), (4, 16, 0)]
    for b in batches:
        assert b["iml"].shape == (2, 32 + 8, 64 + b["board_w_left"])
        assert b["disp"].shape == (2, 32, 64)
    # determinism + mid-epoch resume: start_batch=2 replays the tail exactly
    again = list(pipe.epoch(1))
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(a["iml"], b["iml"])
    tail = list(pipe.epoch(1, start_batch=2))
    assert len(tail) == 2
    for a, b in zip(batches[2:], tail):
        np.testing.assert_array_equal(a["iml"], b["iml"])
        assert a["board_w_left"] == b["board_w_left"]


def test_image_width_header_sniff(tmp_path):
    import cv2
    img = np.zeros((10, 37), np.uint8)
    cv2.imwrite(str(tmp_path / "a.png"), img)
    assert P.image_width(str(tmp_path / "a.png")) == 37
    pfmio.write_pfm(str(tmp_path / "a.pfm"), np.zeros((10, 23), np.float32))
    assert P.image_width(str(tmp_path / "a.pfm")) == 23


def test_multi_host_bucketed_schedule_lockstep(tmp_path):
    """Multi-host schedules must agree step-by-step in GEOMETRY, not just
    count: each geometry compiles a different program, so hosts entering
    the same global step with different geometries hang the mesh exactly
    like unequal step counts (code-review finding, round 4). Uses an
    uneven wide/narrow mix so the hosts' shards bucket differently."""
    import cv2
    rng = np.random.default_rng(9)
    entries = []
    widths = [160, 160, 160, 160, 160, 70, 70, 70, 70, 160, 70, 160]
    for i, w in enumerate(widths):
        base = rng.integers(0, 256, (80, w + 8), dtype=np.uint8)
        ldir = tmp_path / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left"
        rdir = tmp_path / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/right"
        ddir = tmp_path / f"FlyingThings3D/disparity/TRAIN/A/{i:04d}/left"
        for d in (ldir, rdir, ddir):
            d.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(ldir / "0006.png"), base[:, 8:])
        cv2.imwrite(str(rdir / "0006.png"), base[:, :w])
        pfmio.write_pfm(str(ddir / "0006.pfm"),
                        np.full((80, w), 8.0, np.float32))
        entries.append(
            f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left/0006.png")
    lst = tmp_path / "train.list"
    lst.write_text("\n".join(entries) + "\n")
    dc = DataConfig(data_path=str(tmp_path), training_list=str(lst))
    mc = MatchingConfig(board_h=4)
    pipes = [P.TrainPipeline(dc, mc, 32, 64, 16, batch_size=2, seed=7,
                             num_threads=1, num_hosts=2, host_id=h)
             for h in range(2)]
    for epoch in range(1, 4):
        scheds = [p.batch_schedule(epoch) for p in pipes]
        # same length AND same per-step geometry on every host
        assert len(scheds[0]) == len(scheds[1]) > 0, (epoch, scheds)
        assert [g for g, _ in scheds[0]] == [g for g, _ in scheds[1]], epoch
