"""Synthetic cross-domain generalization experiment (VERDICT r3 item 6).

The paper's central claim (reference README.md:92-101): matching-space
inputs generalize across domains where raw-intensity inputs do not. No real
dataset exists in this environment, so this experiment demonstrates the
mechanism on parallax-correct synthetic scenes:

  * two scene FAMILIES with disjoint texture + photometric statistics:
      A: low-frequency blotch textures, photometrically matched views
      B: high-frequency oriented stripes / checkerboards, gamma-warped,
         with a per-scene gain/bias difference between the two views
         (the radiometric variation census/NCC are built to absorb)
  * scenes are layered: a background plane plus several occluding shapes,
    each at its own disparity — spatially varying GT with occlusion edges,
    not a constant shift
  * train MS-GCNet on family A twice at the reference recipe (crop 256x512,
    D=192, batch 2, Adam 1e-3): once with matching-space features
    (--features ms) and once with the same-budget raw-intensity concat
    volume (--features raw, channels [L(x), R(x-d)])
  * zero-shot eval BOTH on held-out family-A scenes (in-domain control) and
    on family-B scenes at KITTI-native 375x1242 through the full CLI
    (kitti2015 tree -> bad-3, the cross-val path)

Geometry: the matchers compare L(x) with R(x-d), so a layer at disparity d
satisfies R(j) = L(j+d). Each layer's content T lives on EXTENDED left
coordinates [0, w+d): the left view reads T[:, :w], the right view reads
T[:, d:d+w], the GT map takes d wherever the layer is the nearest visible
one. Layers paint far -> near (nearer occludes).

Usage: python scripts/exp_cross_domain.py [n_train] [n_epochs] [outdir]
                                          [model_name]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import re
import sys
import tempfile

import numpy as np

D_BG = (8, 24)          # background plane disparity range (full-res px)
D_FG = (28, 72)         # foreground shape disparities — capped so the
                        # semi-occluded bands (width = d_fg - d_bg, left of
                        # each shape) stay realistic; the first cut went to
                        # 120 and occlusions alone contributed ~15 px EPE
MAX_DISP = 192          # the evaluated models' disparity range; eval GT
                        # masks the left MAX_DISP-wide band (below)


# ---------------------------------------------------------------------------
# textures (the domain gap)
# ---------------------------------------------------------------------------

def texture_A(rng, h, w):
    """Low-frequency blotches + mild noise (photometrically tame)."""
    import cv2
    g = rng.integers(40, 216, (h // 8 + 2, w // 8 + 2)).astype(np.uint8)
    t = cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC).astype(np.int32)
    t += rng.integers(-12, 13, t.shape)
    return np.clip(t, 0, 255).astype(np.float32)


def texture_B(rng, h, w):
    """High-frequency APERIODIC texture, gamma-warped.

    Random-dot fields / binarized noise — very different statistics from
    family A's smooth blotches, but matchable in principle (periodic
    stripes/checkerboards were tried first and make matching ill-posed:
    d and d +- lambda are indistinguishable, so EVERY method fails and the
    experiment shows nothing)."""
    import cv2
    if rng.random() < 0.5:
        # random dots at a coarse cell size (classic random-dot stereogram)
        s = int(rng.integers(2, 5))
        g = (rng.random((h // s + 1, w // s + 1)) < 0.5).astype(np.float32)
        t = cv2.resize(g, (w, h), interpolation=cv2.INTER_NEAREST)
    else:
        # binarized band-limited noise (aperiodic speckle)
        g = rng.random((h // 3 + 1, w // 3 + 1)).astype(np.float32)
        t = cv2.resize(g, (w, h), interpolation=cv2.INTER_LINEAR)
        t = (t > np.median(t)).astype(np.float32)
    gamma = float(rng.choice([0.45, 1.0, 2.2]))
    t = np.power(np.clip(t * 0.8 + 0.1, 0.0, 1.0), gamma)
    lo, hi = rng.uniform(0, 60), rng.uniform(180, 255)
    return (lo + t * (hi - lo)).astype(np.float32)


# ---------------------------------------------------------------------------
# parallax-correct layered scenes
# ---------------------------------------------------------------------------

def render_scene(rng, h, w, family):
    """(left, right, disp) uint8/uint8/float32, layered, L(x) = R(x-d).

    GT disparity is OCCLUSION-MASKED like the datasets' noc ground truth:
    left pixels whose right-view location is covered by a nearer layer (or
    falls off the right frame) get GT 0 = invalid under the eval mask
    (0.001 <= gt). Semi-occluded bands are unmatchable in principle; with
    full GT there they contributed ~15 px EPE of pure guessing noise to
    every method and drowned the domain signal."""
    tex = texture_A if family == "A" else texture_B
    left = np.zeros((h, w), np.float32)
    right = np.zeros((h, w), np.float32)
    disp = np.zeros((h, w), np.float32)
    rdisp = np.zeros((h, w), np.float32)   # right-view z-buffer (disparity)

    def paint(d, mask_ext, t_ext):
        """One layer at disparity d. mask_ext/t_ext on extended left
        coords [h, w+d]."""
        ml = mask_ext[:, :w]
        mr = mask_ext[:, d:d + w]
        left[ml] = t_ext[:, :w][ml]
        right[mr] = t_ext[:, d:d + w][mr]
        disp[ml] = float(d)
        rdisp[mr] = float(d)

    # background plane
    d0 = int(rng.integers(*D_BG))
    paint(d0, np.ones((h, w + d0), bool), tex(rng, h, w + d0))

    # foreground shapes, far -> near
    n_shapes = int(rng.integers(4, 8))
    ds = np.sort(rng.integers(D_FG[0], D_FG[1] + 1, n_shapes))
    for d in ds:
        d = int(d)
        we = w + d
        mask = np.zeros((h, we), bool)
        cy = int(rng.integers(h // 8, 7 * h // 8))
        cx = int(rng.integers(we // 8, 7 * we // 8))
        ry = int(rng.integers(h // 12, h // 4))
        rx = int(rng.integers(we // 24, we // 8))
        if rng.random() < 0.5:                     # ellipse
            yy, xx = np.mgrid[0:h, 0:we]
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        else:                                      # rectangle
            mask[max(0, cy - ry):cy + ry, max(0, cx - rx):cx + rx] = True
        paint(d, mask, tex(rng, h, we))

    if family == "B":
        # per-scene photometric difference between the views (gain/bias) —
        # the radiometric nuisance census/NCC absorb and raw intensity can't
        gain = float(rng.uniform(0.82, 1.18))
        bias = float(rng.uniform(-15, 15))
        right = right * gain + bias

    # occlusion mask (noc GT): left pixel x at disparity d is scoreable iff
    # its right-view location x-d is in-frame and still shows THIS layer
    yy, xx = np.mgrid[0:h, 0:w]
    xr = xx - disp.astype(int)
    vis = xr >= 0
    vis[vis] = rdisp[yy[vis], xr[vis]] == disp[vis]
    disp = np.where(vis, disp, 0.0)

    u8 = lambda a: np.clip(a, 0, 255).astype(np.uint8)
    return u8(left), u8(right), disp.astype(np.float32)


def _mask_left_band(disp, test):
    """Zero eval GT in the left MAX_DISP-wide band (GT 0 = invalid under
    the eval mask). For x < MAX_DISP part of the cost volume's disparity
    axis references out-of-frame right-view columns and carries SENTINEL
    features; training crops always include the bwl = max_disp margin
    (crop_position), so the region's sentinel statistics are never
    supervised and every model fills it with confident garbage — round-5
    measurement: a fully-converged MS-GCNet scored EPE 0.2-0.6 everywhere
    EXCEPT this band's ~110, which alone produced round-4's "in-domain
    under-convergence" (5.47 overall). Real KITTI GT is effectively absent
    there (sparse lidar + occlusion), so masking mirrors the reference's
    actual scoring protocol (README.md:92-101). Train GT is left unmasked —
    the margin construction already keeps training inside supported
    columns."""
    if test:
        disp = disp.copy()
        disp[:, :MAX_DISP] = 0.0
    return disp


def write_sf_tree(root, n, h, w, family, seed, test=False):
    """Scene-Flow-layout tree (train / in-domain eval)."""
    import cv2
    from msnets_tpu.data import pfm as pfmio
    rng = np.random.default_rng(seed)
    entries = []
    split = "TEST" if test else "TRAIN"
    for i in range(n):
        left, right, disp = render_scene(rng, h, w, family)
        disp = _mask_left_band(disp, test)
        rel = f"FlyingThings3D/frames_finalpass/{split}/A/{i:04d}/left"
        ldir = os.path.join(root, rel)
        rdir = ldir.replace("/left", "/right")
        ddir = os.path.join(root,
                            f"FlyingThings3D/disparity/{split}/A/{i:04d}/left")
        for d in (ldir, rdir, ddir):
            os.makedirs(d, exist_ok=True)
        cv2.imwrite(os.path.join(ldir, "0006.png"), left)
        cv2.imwrite(os.path.join(rdir, "0006.png"), right)
        pfmio.write_pfm(os.path.join(ddir, "0006.pfm"), disp)
        entries.append(rel + "/0006.png")
    lst = os.path.join(root, f"{family}_{split.lower()}.list")
    with open(lst, "w") as f:
        f.write("\n".join(entries) + "\n")
    return lst


def write_kitti_tree(root, n, family, seed):
    """KITTI-2015-layout tree at native 375x1242 (cross-domain eval)."""
    import cv2
    from msnets_tpu.data import pfm as pfmio
    rng = np.random.default_rng(seed)
    h, w = 375, 1242
    for d in ("image_0", "image_1", "disp_occ_0_pfm"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    entries = []
    for i in range(n):
        left, right, disp = render_scene(rng, h, w, family)
        disp = _mask_left_band(disp, test=True)
        entry = f"{i:06d}_10.png"
        cv2.imwrite(os.path.join(root, "image_0", entry), left)
        cv2.imwrite(os.path.join(root, "image_1", entry), right)
        pfmio.write_pfm(os.path.join(root, "disp_occ_0_pfm",
                                     entry.replace(".png", ".pfm")), disp)
        entries.append(entry)
    lst = os.path.join(root, f"{family}_kitti.list")
    with open(lst, "w") as f:
        f.write("\n".join(entries) + "\n")
    return lst


# ---------------------------------------------------------------------------
# experiment driver
# ---------------------------------------------------------------------------

def _run_cli(argv, capture=False):
    from msnets_tpu import cli
    if not capture:
        cli.main(argv)
        return ""
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(argv)
    out = buf.getvalue()
    sys.stdout.write(out[-2000:])
    return out


def _scores(out):
    """Parse the Evaluator's final line:
    '===> Total N Frames ==> AVG EPE: x.xxxx, AVG Bad-t.t: y.yyyy'."""
    e = re.search(r"AVG EPE:\s*([\d.]+)", out)
    r = re.search(r"AVG Bad-[\d.]+:\s*([\d.]+)", out)
    return (float(e.group(1)) if e else None,
            float(r.group(1)) if r else None)


def run_arm(root, kroot, model, mode, n_train, n_epochs, seed,
            train_lst, evalA_lst, evalB_lst):
    """Train one (features-mode, seed) arm and eval in/cross domain.

    mode: 'ms' | 'raw' | 'ms16' ('ms16' = matching-space with the
    16-channel L+R feature assembly, --cbmv_F 16 — the one reference
    capability with no accuracy evidence before round 5)."""
    feats = "ms" if mode == "ms16" else mode
    extra = ["--cbmv_F=16"] if mode == "ms16" else []
    ck = os.path.join(root, f"ck_{mode}_s{seed}")
    print(f"[xdom] === training features={mode} seed={seed} "
          f"({n_train} scenes x {n_epochs} epochs) ===", flush=True)
    _run_cli(["--mode=train", f"--model_name={model}",
              "--crop_height=256", "--crop_width=512",
              "--max_disp=192", "--batchSize=2", f"--nEpochs={n_epochs}",
              f"--seed={seed}", f"--features={feats}", f"--data_path={root}",
              f"--training_list={train_lst}", f"--test_list={evalA_lst}",
              f"--checkpoint_dir={ck}", "--train_logdir=", "--threads=2",
              "--lr=1e-3", "--log_summary_step=1000"] + extra)
    ckpt = os.path.join(ck, model, f"model_epoch_{n_epochs:05d}.msgpack")
    row = {}
    print(f"[xdom] eval features={mode} s{seed} on family A (in-domain)",
          flush=True)
    out = _run_cli(["--mode=test", f"--model_name={model}",
                    "--crop_height=320",
                    "--crop_width=768", "--max_disp=192",
                    f"--features={feats}", f"--data_path={root}",
                    f"--test_list={evalA_lst}", f"--resume={ckpt}",
                    f"--resultDir={os.path.join(root, f'resA_{mode}_{seed}')}"]
                   + extra, capture=True)
    row["in_domain_A"] = _scores(out)
    print(f"\n[xdom] eval features={mode} s{seed} on family B "
          f"(cross-domain, KITTI-native, bad-3)", flush=True)
    out = _run_cli(["--mode=test", f"--model_name={model}",
                    "--crop_height=384",
                    "--crop_width=1248", "--max_disp=192",
                    f"--features={feats}", "--kitti2015=1",
                    f"--data_path={kroot}", f"--test_list={evalB_lst}",
                    f"--resume={ckpt}",
                    f"--resultDir={os.path.join(root, f'resB_{mode}_{seed}')}"]
                   + extra, capture=True)
    row["cross_domain_B"] = _scores(out)
    return row


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    root = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(
        prefix="msnets_xdom_")
    model = sys.argv[4] if len(sys.argv) > 4 else "MS-GCNet"
    seeds = [int(s) for s in sys.argv[5].split(",")] \
        if len(sys.argv) > 5 else [3]
    modes = sys.argv[6].split(",") if len(sys.argv) > 6 else ["ms", "raw"]
    os.makedirs(root, exist_ok=True)
    h, w = 320, 768   # room for crop 256x512 + margins

    print(f"[xdom] root={root} seeds={seeds} modes={modes}", flush=True)
    train_lst = write_sf_tree(root, n_train, h, w, "A", seed=11)
    evalA_lst = write_sf_tree(root, 6, h, w, "A", seed=12, test=True)
    kroot = os.path.join(root, "ktree")
    evalB_lst = write_kitti_tree(kroot, 6, "B", seed=13)

    results = {}
    res_path = os.path.join(root, "results.json")
    for mode in modes:
        per_seed = []
        for seed in seeds:
            per_seed.append(run_arm(root, kroot, model, mode, n_train,
                                    n_epochs, seed, train_lst, evalA_lst,
                                    evalB_lst))
            results[mode] = _aggregate(per_seed)
            with open(res_path, "w") as f:     # checkpoint partial results
                json.dump(results, f, indent=2)

    print("\n[xdom] ===== RESULTS (mean [min..max] over "
          f"{len(seeds)} seed(s)) =====")
    for mode, agg in results.items():
        def fmt(k):
            m = agg[k]
            return (f"EPE {m['epe_mean']:.2f} [{m['epe_min']:.2f}.."
                    f"{m['epe_max']:.2f}] bad {m['bad_mean']:.3f} "
                    f"[{m['bad_min']:.3f}..{m['bad_max']:.3f}]")
        print(f"  features={mode:5s}  in-domain A: {fmt('in_domain_A')}   "
              f"cross-domain B: {fmt('cross_domain_B')}")
    print(f"[xdom] wrote {res_path}")


def _aggregate(per_seed):
    """Per-mode mean/min/max over seeds + the raw per-seed rows."""
    agg = {"seeds": per_seed}
    for k in ("in_domain_A", "cross_domain_B"):
        epes = [float(r[k][0]) for r in per_seed]
        bads = [float(r[k][1]) for r in per_seed]
        agg[k] = {"epe_mean": sum(epes) / len(epes), "epe_min": min(epes),
                  "epe_max": max(epes), "bad_mean": sum(bads) / len(bads),
                  "bad_min": min(bads), "bad_max": max(bads)}
    return agg


if __name__ == "__main__":
    main()
