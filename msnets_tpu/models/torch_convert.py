"""PyTorch checkpoint -> Flax parameter conversion.

The reference publishes pretrained checkpoints as torch ``.tar`` files
(``{epoch, state_dict, optimizer, ...}``, reference main_msnet.py:210-221,
509-526) with ``module.``-prefixed keys from nn.DataParallel. This module
maps them onto our Flax module trees so BASELINE config 1 ("pretrained
ckpt") is satisfiable.

Weight-layout transforms:
  * Conv3d          torch [out, in, kd, kh, kw] -> flax [kd, kh, kw, in, out]
  * ConvTranspose3d torch [in, out, kd, kh, kw] -> our Deconv3D stores the
    spatially *flipped* kernel as [kd, kh, kw, in, out] (Deconv3D implements
    the transposed conv as an input-dilated correlation, see
    models/layers.py), so: flip spatial axes, then transpose.
  * BatchNorm       weight/bias -> scale/bias; running_mean/var -> batch_stats
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def _set(tree: dict, path: Tuple[str, ...], val: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.ascontiguousarray(val)


def _bn_entries(torch_prefix: str, flax_path: Tuple[str, ...]):
    return [
        (f"{torch_prefix}.weight", "params", flax_path + ("scale",), None),
        (f"{torch_prefix}.bias", "params", flax_path + ("bias",), None),
        (f"{torch_prefix}.running_mean", "batch_stats", flax_path + ("mean",), None),
        (f"{torch_prefix}.running_var", "batch_stats", flax_path + ("var",), None),
    ]


def _convbn_entries(torch_prefix: str, flax_prefix: Tuple[str, ...]):
    """reference convbn_3d = Sequential(Conv3d, BatchNorm3d)."""
    e = [(f"{torch_prefix}.0.weight", "params", flax_prefix + ("conv", "kernel"), _conv3d)]
    e += _bn_entries(f"{torch_prefix}.1", flax_prefix + ("bn",))
    return e


def gcnet_key_map():
    """torch key -> (collection, flax path, transform) for MS-GCNet
    (reference gcnet_3dcnn.py:57-95)."""
    entries = []
    entries += _convbn_entries("conv3dbn_1", ("conv3dbn_1",))
    entries += _convbn_entries("conv3dbn_2", ("conv3dbn_2",))
    for k in range(1, 5):
        for j in range(1, 4):
            # Conv3DBlock assigns convbn_3d Sequentials directly as
            # convbn_3d_{1..3} (gcnet_3dcnn.py:30-37); the key set is pinned
            # against the reference module tree by
            # tests/test_torch_convert_schema.py
            entries += _convbn_entries(
                f"block_3d_{k}.convbn_3d_{j}",
                (f"block_3d_{k}", f"convbn_3d_{j}"))
    for k in range(1, 5):
        entries.append((f"deconvbn{k}.0.weight", "params",
                        (f"deconvbn{k}", "deconv", "kernel"), _deconv3d))
        entries += _bn_entries(f"deconvbn{k}.1", (f"deconvbn{k}", "bn"))
    entries.append(("deconv5.weight", "params", ("deconv5", "kernel"), _deconv3d))
    entries.append(("deconv5.bias", "params", ("deconv5", "bias"), None))
    return {k: (c, p, t) for k, c, p, t in entries}


def _hourglass_entries(torch_prefix: str, flax_name: str):
    e = []
    # conv1 = Seq(convbn, ReLU); conv2 = convbn; conv3/conv4 like conv1
    e += _convbn_entries(f"{torch_prefix}.conv1.0", (flax_name, "conv1"))
    e += _convbn_entries(f"{torch_prefix}.conv2", (flax_name, "conv2"))
    e += _convbn_entries(f"{torch_prefix}.conv3.0", (flax_name, "conv3"))
    e += _convbn_entries(f"{torch_prefix}.conv4.0", (flax_name, "conv4"))
    # conv5/conv6 = Seq(ConvTranspose3d, BatchNorm3d) -> DeconvBN3D
    for c in (5, 6):
        e.append((f"{torch_prefix}.conv{c}.0.weight", "params",
                  (flax_name, f"conv{c}", "deconv", "kernel"), _deconv3d))
        e += _bn_entries(f"{torch_prefix}.conv{c}.1",
                         (flax_name, f"conv{c}", "bn"))
    return e


def psmnet_key_map():
    """torch key -> (collection, flax path, transform) for MS-PSMNet
    (intended architecture, reference psmnet_3dcnn.py:92-124)."""
    entries = []
    entries += _convbn_entries("dres0.0", ("dres0_1",))
    entries += _convbn_entries("dres0.2", ("dres0_2",))
    entries += _convbn_entries("dres1.0", ("dres1_1",))
    entries += _convbn_entries("dres1.2", ("dres1_2",))
    for i, name in ((2, "dres2"), (3, "dres3"), (4, "dres4")):
        entries += _hourglass_entries(f"dres{i}", name)
    for i in (1, 2, 3):
        entries += _convbn_entries(f"classif{i}.0", (f"classif{i}", "convbn"))
        entries.append((f"classif{i}.2.weight", "params",
                        (f"classif{i}", "conv", "kernel"), _conv3d))
    return {k: (c, p, t) for k, c, p, t in entries}


def convert_state_dict(state_dict: Dict[str, "np.ndarray"], model_name: str):
    """Convert a reference torch state_dict to {'params': .., 'batch_stats': ..}.

    Accepts torch tensors or numpy arrays; strips DataParallel's ``module.``
    prefix and ignores ``num_batches_tracked``.
    """
    key_map = gcnet_key_map() if model_name == "MS-GCNet" else psmnet_key_map()
    out = {"params": {}, "batch_stats": {}}
    matched, skipped = 0, []
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        if k not in key_map:
            skipped.append(k)
            continue
        coll, path, tf = key_map[k]
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                         dtype=np.float32)
        if tf is not None:
            arr = tf(arr)
        _set(out[coll], path, arr)
        matched += 1
    if skipped:
        import warnings
        warnings.warn(f"convert_state_dict: {len(skipped)} unmatched keys, "
                      f"e.g. {skipped[:5]}")
    return out


def load_torch_tar(path: str, model_name: str):
    """Load a reference ``model_epoch_*.tar`` and convert.

    Returns (variables, meta) where meta carries {epoch, loss, epe_err, accu3}
    when present (reference save_checkpoint, main_msnet.py:509-516).
    """
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    meta = {k: ckpt[k] for k in ("epoch", "loss", "epe_err", "accu3") if k in ckpt}
    return convert_state_dict(sd, model_name), meta
