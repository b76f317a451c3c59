"""Debug visualization & introspection helpers.

Parity with the reference's eyeball-check tooling (SURVEY.md §4):
  * per-channel argmin/argmax grids of the 8 MS feature channels
    (reference debug_cbmv_featues, cbmv_generator.py:364-387)
  * multi-image matplotlib grids (funcs_utili.py:17-110)
  * parameter-count printout (funcs_utili.py:116-136)
  * dataloader length helper (funcs_utili.py:139-146)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

FEATURE_NAMES = ["censusL", "nccL", "sobelL", "sadL",
                 "likly_cenL", "likly_nccL", "likly_sobL", "likly_sadL"]


def feature_argmin_maps(feats_cdhw: np.ndarray) -> Dict[str, np.ndarray]:
    """argmin (cost channels 0-3) / argmax (AML channels 4-7) over D.

    feats: [C=8, D, H, W] -> dict of [H, W] float32 disparity estimates.
    """
    out = {}
    for k, name in enumerate(FEATURE_NAMES):
        vol = np.asarray(feats_cdhw[k])
        red = np.argmin if k < 4 else np.argmax
        out[name] = red(vol, axis=0).astype(np.float32)
    return out


def show_image_grid(imgs: Sequence[np.ndarray],
                    names: Optional[Sequence[str]] = None,
                    cols: int = 4, cmap: str = "inferno",
                    save_path: Optional[str] = None):
    """Grid plot of debug images; saves to file when ``save_path`` given
    (headless-friendly), else plt.show()."""
    import matplotlib
    if save_path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    n = len(imgs)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(np.asarray(imgs[i]), cmap=cmap)
            if names:
                ax.set_title(names[i], fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    else:
        plt.show()


def debug_ms_features(feats_cdhw: np.ndarray,
                      save_path: Optional[str] = None):
    """The reference's 8-panel feature-quality probe."""
    maps = feature_argmin_maps(feats_cdhw)
    show_image_grid(list(maps.values()), list(maps.keys()),
                    save_path=save_path)
    for k, (name, img) in enumerate(maps.items()):
        print(f"feature {k} : {name:>10}, min = {img.min()}, max = {img.max()}")


def count_params(params) -> int:
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def print_params(params, prefix: str = ""):
    """Per-layer parameter counts (funcs_utili.print_ms_gcnet_params)."""
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        print(f"{prefix}{name}: shape {tuple(leaf.shape)}, "
              f"# {int(np.prod(leaf.shape))}")
    print(f"{prefix}total: {count_params(params)}")


def dataloader_len(list_file: str, batch_size: int) -> int:
    """len(file_list) // batch (funcs_utili.py:139-146)."""
    with open(list_file) as f:
        n = sum(1 for l in f if l.strip())
    return n // batch_size
