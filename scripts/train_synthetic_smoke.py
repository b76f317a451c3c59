"""End-to-end learning smoke on the real TPU at production shapes.

Synthesizes a small Scene-Flow-layout dataset on disk (random textures,
known constant disparity per scene), trains MS-GCNet through the full CLI
path (host pipeline -> device feature stage -> packed train step -> Adam)
at the reference recipe shapes (crop 256x512, D=192, batch 2), then runs
the CLI test mode on held-out synthetic pairs. Passes when train EPE falls
below ~1 px and test AVG EPE is sub-pixel — evidence the whole stack
learns, not just that it compiles (complements the tiny-shape CPU tests).

Usage: python scripts/train_synthetic_smoke.py [n_train] [n_epochs]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import tempfile

import numpy as np


def make_tree(root, n, h, w, seed=0, test=False):
    import cv2
    from msnets_tpu.data import pfm as pfmio
    rng = np.random.default_rng(seed)
    entries = []
    split = "TEST" if test else "TRAIN"
    for i in range(n):
        shift = int(rng.integers(4, 24))
        # smooth random texture: matchers need local structure, not iid noise
        base = rng.integers(0, 256, (h // 4, (w + shift) // 4 + 1))
        base = cv2.resize(base.astype(np.uint8), (w + shift, h),
                          interpolation=cv2.INTER_CUBIC)
        noise = rng.integers(0, 32, base.shape, dtype=np.uint8)
        base = np.clip(base.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        rel = f"FlyingThings3D/frames_finalpass/{split}/A/{i:04d}/left"
        ldir, rdir = root + "/" + rel, root + "/" + rel.replace("left", "right")
        ddir = root + (f"/FlyingThings3D/disparity/{split}/A/{i:04d}/left")
        for d in (ldir, rdir, ddir):
            os.makedirs(d, exist_ok=True)
        # L(x) = R(x - d): left reads base[0:w], right reads base[shift:]
        cv2.imwrite(ldir + "/0006.png", base[:, :w])
        cv2.imwrite(rdir + "/0006.png", base[:, shift:shift + w])
        pfmio.write_pfm(ddir + "/0006.pfm", np.full((h, w), float(shift),
                                                    np.float32))
        entries.append(rel + "/0006.png")
    lst = root + ("/test.list" if test else "/train.list")
    with open(lst, "w") as f:
        f.write("\n".join(entries) + "\n")
    return lst


def main():
    from msnets_tpu import cli

    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    h, w = 320, 768                     # room for crop 256x512 + margins
    root = tempfile.mkdtemp(prefix="msnets_smoke_")
    train_lst = make_tree(root, n_train, h, w, seed=1)
    test_lst = make_tree(root, 4, h, w, seed=2, test=True)
    ck = root + "/ck"

    cli.main(["--mode=train", "--crop_height=256", "--crop_width=512",
              "--max_disp=192", "--batchSize=2", f"--nEpochs={n_epochs}",
              "--seed=3", f"--data_path={root}",
              f"--training_list={train_lst}", f"--test_list={test_lst}",
              f"--checkpoint_dir={ck}", "--train_logdir=", "--threads=2",
              "--lr=1e-3", "--log_summary_step=50"])

    res = root + "/results"
    cli.main(["--mode=test", "--crop_height=320", "--crop_width=768",
              "--max_disp=192", f"--data_path={root}",
              f"--test_list={test_lst}",
              f"--resume={ck}/MS-GCNet/model_epoch_{n_epochs:05d}.msgpack",
              f"--resultDir={res}"])
    print(f"[smoke] dataset root: {root}")


if __name__ == "__main__":
    main()
