"""CLI surface tests: train -> checkpoint -> test on a synthetic dataset."""
import os

import numpy as np
import pytest

from msnets_tpu import cli
from msnets_tpu.data import pfm as pfmio


def _make_tree(root, n=2, h=96, w=192, disp_val=6.0):
    import cv2
    rng = np.random.default_rng(5)
    entries = []
    for i in range(n):
        shift = int(disp_val)
        base = rng.integers(0, 256, (h, w + shift), dtype=np.uint8)
        ldir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left"
        rdir = root / f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/right"
        ddir = root / f"FlyingThings3D/disparity/TRAIN/A/{i:04d}/left"
        for d in (ldir, rdir, ddir):
            d.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(ldir / "0006.png"), base[:, :w])
        cv2.imwrite(str(rdir / "0006.png"), base[:, shift:])
        pfmio.write_pfm(str(ddir / "0006.pfm"),
                        np.full((h, w), disp_val, np.float32))
        entries.append(f"FlyingThings3D/frames_finalpass/TRAIN/A/{i:04d}/left/0006.png")
    lst = root / "list.list"
    lst.write_text("\n".join(entries) + "\n")
    return str(lst)


def test_parser_defaults_match_reference():
    p = cli.build_parser()
    a = p.parse_args([])
    assert a.max_disp == 192 and a.lr == 0.001 and a.model_name == "MS-GCNet"
    cfg = cli.args_to_config(a)
    assert cfg.data.dataset == "sceneflow"
    assert cfg.model.max_disp == 192


def test_host_shard_flags_reach_pipeline(tmp_path):
    """--num_hosts/--host_id must propagate to the TrainPipeline's strided
    input shard (multi-host input pipeline, SURVEY.md §2.3)."""
    lst = _make_tree(tmp_path, n=5)
    a = cli.build_parser().parse_args(
        ["--num_hosts=2", "--host_id=1", f"--training_list={lst}",
         f"--data_path={tmp_path}"])
    cfg = cli.args_to_config(a)
    assert cfg.train.num_hosts == 2 and cfg.train.host_id == 1
    from msnets_tpu.data.pipeline import TrainPipeline
    p = TrainPipeline(cfg.data, cfg.matching, 64, 128, 32, 1,
                      num_hosts=cfg.train.num_hosts,
                      host_id=cfg.train.host_id)
    assert p.steps_per_epoch() == 2     # 5 entries // 2 hosts // batch 1


def test_dataset_flag_dispatch():
    a = cli.build_parser().parse_args(["--kitti2015=1"])
    cfg = cli.args_to_config(a)
    assert cfg.data.dataset == "kitti2015"
    assert cfg.data.bad_threshold == 3.0


def test_remat_default_is_model_dependent():
    """MS-GCNet defaults to no remat (faster). MS-PSMNet's reference-recipe
    default is no-remat + micro-batch-1 accumulation (grad_accum=batch,
    406 vs 659 ms/step, PERF.md round 5) for ANY batch >= 2 — micro-batch 1
    is the only no-remat size that fits (10.6 GiB vs ~20 for micro-batch
    2); batch 1 falls back to remat-all, and explicit
    --remat/--no_remat/--grad_accum override."""
    c = cli.args_to_config(cli.build_parser().parse_args([]))
    assert c.train.remat is False and c.train.grad_accum == 1
    c = cli.args_to_config(cli.build_parser().parse_args(
        ["--model_name=MS-PSMNet", "--batchSize=2"]))
    assert c.train.remat is False and c.train.grad_accum == 2
    # batch 1 (the parser default) -> remat-all
    c = cli.args_to_config(cli.build_parser().parse_args(
        ["--model_name=MS-PSMNet"]))
    assert c.train.remat is True and c.train.grad_accum == 1
    # odd batches >= 2 and larger even batches keep micro-batch 1
    c = cli.args_to_config(cli.build_parser().parse_args(
        ["--model_name=MS-PSMNet", "--batchSize=3"]))
    assert c.train.remat is False and c.train.grad_accum == 3
    c = cli.args_to_config(cli.build_parser().parse_args(
        ["--model_name=MS-PSMNet", "--batchSize=4"]))
    assert c.train.remat is False and c.train.grad_accum == 4
    c = cli.args_to_config(cli.build_parser().parse_args(
        ["--model_name=MS-PSMNet", "--batchSize=2", "--grad_accum=4"]))
    assert c.train.remat is True and c.train.grad_accum == 4
    c = cli.args_to_config(cli.build_parser().parse_args(
        ["--model_name=MS-PSMNet", "--no_remat"]))
    assert c.train.remat is False and c.train.grad_accum == 1
    c = cli.args_to_config(cli.build_parser().parse_args(["--remat"]))
    assert c.train.remat is True


@pytest.mark.slow
def test_cli_loop_train_resumes_each_epoch(tmp_path, capsys):
    """loop-train: epoch-granular restart driver (do_main_msnet.sh:143-192
    semantics) — each epoch resumes from the previous epoch's checkpoint
    and writes the next model_epoch_%05d file."""
    lst = _make_tree(tmp_path)
    ckpt_dir = str(tmp_path / "ck")
    argv = ["--mode=loop-train", "--crop_height=64", "--crop_width=128",
            "--max_disp=32", "--batchSize=2", "--nEpochs=2", "--seed=7",
            f"--data_path={tmp_path}", f"--training_list={lst}",
            f"--test_list={lst}", f"--checkpoint_dir={ckpt_dir}",
            "--train_logdir=", "--threads=2", "--compute_dtype=float32",
            "--no_remat"]
    cli.main(argv)
    for ep in (1, 2):
        assert os.path.exists(os.path.join(
            ckpt_dir, "MS-GCNet", f"model_epoch_{ep:05d}.msgpack")), ep
    out = capsys.readouterr().out
    assert "Epoch 2 Complete" in out


def _make_kitti_tree(root, n=2, h=96, w=192, disp_val=6.0):
    import cv2
    rng = np.random.default_rng(9)
    entries = []
    for d in ("image_0", "image_1", "disp_occ_0_pfm"):
        (root / d).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        shift = int(disp_val)
        base = rng.integers(0, 256, (h, w + shift), dtype=np.uint8)
        name = f"{i:06d}_10.png"
        cv2.imwrite(str(root / "image_0" / name), base[:, :w])
        cv2.imwrite(str(root / "image_1" / name), base[:, shift:])
        pfmio.write_pfm(str(root / "disp_occ_0_pfm" / (name[:-4] + ".pfm")),
                        np.full((h, w), disp_val, np.float32))
        entries.append(name)
    lst = root / "kt15.list"
    lst.write_text("\n".join(entries) + "\n")
    return str(lst)


@pytest.mark.slow
def test_cli_kitti_train_uses_kt15_color_summaries(tmp_path, capsys,
                                                   monkeypatch):
    """KITTI-flagged training colorizes TB disparity grids with the KT15
    false-color map, not jet (main_msnet.py:246-320 via dispColor.py:42-57)."""
    from msnets_tpu.utils import summary as S
    lst = _make_kitti_tree(tmp_path)
    logdir = str(tmp_path / "tb")
    calls = []
    orig = S.TrainSummaryWriter.images

    def spy(self, *a, **kw):
        calls.append(kw.get("kt15_color", False))
        return orig(self, *a, **kw)

    monkeypatch.setattr(S.TrainSummaryWriter, "images", spy)
    argv = ["--mode=train", "--crop_height=64", "--crop_width=128",
            "--max_disp=32", "--batchSize=2", "--nEpochs=1", "--seed=7",
            "--kitti2015=1", f"--data_path={tmp_path}",
            f"--training_list={lst}", f"--test_list={lst}",
            f"--checkpoint_dir={tmp_path / 'ck'}",
            f"--train_logdir={logdir}", "--log_summary_step=1",
            "--threads=2", "--compute_dtype=float32", "--no_remat"]
    cli.main(argv)
    assert calls and all(calls)
    events = [f for f in os.listdir(logdir) if "events" in f]
    assert events and os.path.getsize(os.path.join(logdir, events[0])) > 1000


@pytest.mark.slow
def test_cli_train_then_test(tmp_path, capsys, monkeypatch):
    lst = _make_tree(tmp_path)
    ckpt_dir = str(tmp_path / "ck")
    # small model via monkeypatched config: shrink base filters through CLI?
    # keep default arch but tiny crops for speed
    logdir = str(tmp_path / "tb")
    argv = ["--mode=train", "--crop_height=64", "--crop_width=128",
            "--max_disp=32", "--batchSize=2", "--nEpochs=1", "--seed=7",
            f"--data_path={tmp_path}", f"--training_list={lst}",
            f"--test_list={lst}", f"--checkpoint_dir={ckpt_dir}",
            f"--train_logdir={logdir}", "--log_summary_step=1",
            "--threads=2", "--compute_dtype=float32", "--no_remat"]
    cli.main(argv)
    ck = os.path.join(ckpt_dir, "MS-GCNet", "model_epoch_00001.msgpack")
    assert os.path.exists(ck)
    # summary writer ran: scalars + image grids + per-matcher argmin probes
    events = [f for f in os.listdir(logdir) if "events" in f]
    assert events and os.path.getsize(os.path.join(logdir, events[0])) > 1000

    out = capsys.readouterr().out
    assert "Epoch 1 Complete" in out

    res = str(tmp_path / "results")
    argv = ["--mode=test", "--crop_height=96", "--crop_width=192",
            "--max_disp=32", f"--data_path={tmp_path}", f"--test_list={lst}",
            f"--resume={ck}", f"--resultDir={res}",
            "--compute_dtype=float32"]
    cli.main(argv)
    out = capsys.readouterr().out
    assert "AVG EPE" in out
    assert os.path.exists(os.path.join(res, "0.pfm"))


@pytest.mark.slow
def test_cli_train_then_test_16ch(tmp_path, capsys):
    """End-to-end cbmv_F=16 (left+right features, extract_features_lr
    semantics — reference cbmv_generator.py:84-254): one CLI train epoch at
    batch 2 with the reference's BOTH-side margins (board_w_right =
    max_disp, forwarded through the pipeline), checkpoint, then CLI test
    with the 16-channel feature stage. VERDICT r3 item 5."""
    lst = _make_tree(tmp_path)
    ckpt_dir = str(tmp_path / "ck")
    logdir = str(tmp_path / "tb")
    argv = ["--mode=train", "--crop_height=64", "--crop_width=128",
            "--max_disp=32", "--batchSize=2", "--nEpochs=1", "--seed=7",
            "--cbmv_F=16",
            f"--data_path={tmp_path}", f"--training_list={lst}",
            f"--test_list={lst}", f"--checkpoint_dir={ckpt_dir}",
            f"--train_logdir={logdir}", "--log_summary_step=1",
            "--threads=2", "--compute_dtype=float32", "--no_remat"]
    cli.main(argv)
    ck = os.path.join(ckpt_dir, "MS-GCNet", "model_epoch_00001.msgpack")
    assert os.path.exists(ck)
    out = capsys.readouterr().out
    assert "Epoch 1 Complete" in out

    res = str(tmp_path / "results")
    argv = ["--mode=test", "--crop_height=96", "--crop_width=192",
            "--max_disp=32", "--cbmv_F=16",
            f"--data_path={tmp_path}", f"--test_list={lst}",
            f"--resume={ck}", f"--resultDir={res}",
            "--compute_dtype=float32"]
    cli.main(argv)
    out = capsys.readouterr().out
    assert "AVG EPE" in out
    assert os.path.exists(os.path.join(res, "0.pfm"))


@pytest.mark.slow
def test_cli_train_then_test_raw_features(tmp_path, capsys):
    """--features=raw (2-channel intensity concat volume, the no-matching
    ablation baseline) trains and tests through the full CLI — the vehicle
    for the cross-domain generalization experiment."""
    lst = _make_tree(tmp_path)
    ckpt_dir = str(tmp_path / "ck")
    argv = ["--mode=train", "--crop_height=64", "--crop_width=128",
            "--max_disp=32", "--batchSize=2", "--nEpochs=1", "--seed=7",
            "--features=raw",
            f"--data_path={tmp_path}", f"--training_list={lst}",
            f"--test_list={lst}", f"--checkpoint_dir={ckpt_dir}",
            "--train_logdir=", "--log_summary_step=50",
            "--threads=2", "--compute_dtype=float32", "--no_remat"]
    cli.main(argv)
    ck = os.path.join(ckpt_dir, "MS-GCNet", "model_epoch_00001.msgpack")
    assert os.path.exists(ck)
    res = str(tmp_path / "results")
    argv = ["--mode=test", "--crop_height=96", "--crop_width=192",
            "--max_disp=32", "--features=raw",
            f"--data_path={tmp_path}", f"--test_list={lst}",
            f"--resume={ck}", f"--resultDir={res}",
            "--compute_dtype=float32"]
    cli.main(argv)
    out = capsys.readouterr().out
    assert "AVG EPE" in out
