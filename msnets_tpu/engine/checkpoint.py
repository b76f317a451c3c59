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
import queue
import shutil
import threading
from os.path import join as pjoin
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def ckpt_path(checkpoint_dir: str, model_name: str, epoch: int) -> str:
    return pjoin(checkpoint_dir, model_name, f"model_epoch_{epoch:05d}.msgpack")


def step_ckpt_path(checkpoint_dir: str, model_name: str, step: int) -> str:
    """Mid-epoch (step-granular) checkpoint name; the sidecar json carries
    {epoch, iteration} so run_train can resume inside the epoch."""
    return pjoin(checkpoint_dir, model_name, f"model_step_{step:08d}.msgpack")


def _atomic_write(path: str, data: bytes) -> None:
    """tmp + os.replace so a crash mid-write never leaves a truncated
    checkpoint at the resume-contract filename."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_checkpoint(checkpoint_dir: str, model_name: str, epoch: int,
                    state: Any, meta: Optional[Dict] = None,
                    is_best: bool = False, path: Optional[str] = None) -> str:
    """Serialize a train-state pytree + sidecar meta json (atomic files)."""
    d = pjoin(checkpoint_dir, model_name)
    os.makedirs(d, exist_ok=True)
    path = path or ckpt_path(checkpoint_dir, model_name, epoch)
    state = jax.device_get(state)
    # sidecar json is written atomically BEFORE the msgpack appears: a
    # crash in between leaves a json without a checkpoint (harmless —
    # nothing resumes a missing msgpack), never a resumable checkpoint
    # with missing/truncated meta (which would silently drop the
    # mid-epoch `iteration` and replay the epoch from batch 0)
    _atomic_write(path + ".json",
                  json.dumps({"epoch": epoch, **(meta or {})}).encode())
    _atomic_write(path, serialization.to_bytes(state))
    if is_best:
        shutil.copyfile(path, pjoin(d, "model_best.msgpack"))
    return path


class AsyncCheckpointer:
    """Non-blocking checkpoint writer (orbax-style async pattern, replacing
    the reference's synchronous torch.save at epoch end, main_msnet.py:
    210-221 — there the whole train loop stalls on the HBM->host fetch plus
    disk write; here the next epoch starts immediately).

    ``save()`` snapshots the state with an ON-DEVICE copy (async dispatch,
    near-free on the host) and hands it to a writer thread that performs the
    device->host fetch, serialization, and the atomic file write. The device
    copy is load-bearing: the jitted train step donates its input state
    (trainer.py ``donate_argnums=(0,)``), so without a private copy the
    writer thread could read HBM buffers the next step has already
    overwritten. Writes are serialized in submission order by a single
    worker; ``wait()`` drains and re-raises the first writer error.
    """

    def __init__(self, max_pending: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._errors: List[BaseException] = []
        self._written: List[str] = []
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                self._written.append(save_checkpoint(**job))
            except BaseException as e:  # surfaced on wait()/close()
                with self._lock:
                    self._errors.append(e)
            finally:
                self._q.task_done()

    @staticmethod
    def _snapshot(state: Any) -> Any:
        # jnp.copy dispatches a device-side copy without blocking the host
        return jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)

    def save(self, checkpoint_dir: str, model_name: str, epoch: int,
             state: Any, meta: Optional[Dict] = None,
             is_best: bool = False, path: Optional[str] = None) -> str:
        """Enqueue a checkpoint write; returns the (future) file path.
        Blocks only if ``max_pending`` writes are already in flight."""
        self._raise_pending()
        path = path or ckpt_path(checkpoint_dir, model_name, epoch)
        job = dict(checkpoint_dir=checkpoint_dir, model_name=model_name,
                   epoch=epoch, state=self._snapshot(state), meta=meta,
                   is_best=is_best, path=path)
        self._q.put(job)
        return path

    def wait(self) -> List[str]:
        """Block until all enqueued writes hit disk; raise writer errors."""
        self._q.join()
        self._raise_pending()
        return list(self._written)

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._thread.join()

    def _raise_pending(self):
        with self._lock:
            if self._errors:
                raise self._errors.pop(0)


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
