"""Checkpoint save/restore with the reference's epoch-addressable naming.

The reference saves ``checkpoint_dir/<model>/model_epoch_%05d.tar`` with
``{epoch, state_dict, optimizer, loss, epe_err, accu3}`` and a
``model_best.tar`` copy (reference main_msnet.py:210-221, 509-526); its bash
driver chains epochs by resuming these files. We keep the same naming
contract (``model_epoch_%05d.msgpack``) so loop-train drivers work
identically, and transparently import reference torch ``.tar`` checkpoints
(weights + batch stats; optimizer state is torch-specific and re-initialized,
matching the reference's own ``strict=False`` behaviour on architecture
changes, main_msnet.py:199-207).
"""
from __future__ import annotations

import json
import os
import shutil
from os.path import join as pjoin
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def ckpt_path(checkpoint_dir: str, model_name: str, epoch: int) -> str:
    return pjoin(checkpoint_dir, model_name, f"model_epoch_{epoch:05d}.msgpack")


def save_checkpoint(checkpoint_dir: str, model_name: str, epoch: int,
                    state: Any, meta: Optional[Dict] = None,
                    is_best: bool = False) -> str:
    """Serialize a train-state pytree + sidecar meta json."""
    d = pjoin(checkpoint_dir, model_name)
    os.makedirs(d, exist_ok=True)
    path = ckpt_path(checkpoint_dir, model_name, epoch)
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(path + ".json", "w") as f:
        json.dump({"epoch": epoch, **(meta or {})}, f)
    if is_best:
        shutil.copyfile(path, pjoin(d, "model_best.msgpack"))
    return path


def load_checkpoint(path: str, target: Any) -> Tuple[Any, Dict]:
    """Restore a pytree saved by save_checkpoint into ``target``'s structure."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def load_weights_any(path: str, model_name: str):
    """Load model weights from either our msgpack or a reference torch .tar.

    Returns {'params': .., 'batch_stats': ..} (msgpack path requires the
    caller to restore into a full state via load_checkpoint instead).
    """
    if path.endswith(".tar"):
        from ..models.torch_convert import load_torch_tar
        variables, _ = load_torch_tar(path, model_name)
        return variables
    raise ValueError("use load_checkpoint with a state template for msgpack")
