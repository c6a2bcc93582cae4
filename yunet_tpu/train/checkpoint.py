"""Checkpoint save/resume via orbax + reference-style metadata.

Mirrors the reference checkpoint contract (tools/train.py:218-223, mmcv
CheckpointHook): periodic epoch checkpoints, a ``latest`` pointer for
--auto-resume discovery (utils/misc.py:11-42), and metadata embedding
version / config name / CLASSES. Weight-only init from a reference ``.pth``
is handled by utils/torch_import.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def to_host(x) -> np.ndarray:
    """Fetch a replicated array to host numpy without collectives:
    on a multi-process mesh, read this process's first addressable shard
    (the full value for replicated arrays). Refuses genuinely sharded
    arrays — shard 0 alone would silently be a partial value (e.g. wrong
    eval APs from a partial param tree)."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        sharding = getattr(x, "sharding", None)
        if sharding is not None and not sharding.is_fully_replicated:
            raise ValueError(
                "to_host: array is sharded, not replicated — reading "
                f"shard 0 would drop data (sharding={sharding})")
        x = x.addressable_data(0)
    return np.asarray(x)


def _ckpt_dir(work_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(work_dir), f"ckpt_{step:08d}")


def _git_hash() -> str:
    """Embed the repo git hash in checkpoint meta (the reference embeds
    mmdet version + git hash, tools/train.py:218-223)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=5)
        return out.stdout.strip() or "unknown"
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return "unknown"


def save_checkpoint(work_dir: str, state, *, epoch: int,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = _ckpt_dir(work_dir, step)
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": state.params, "state": state.state,
            "opt_state": state.opt_state, "step": state.step}
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    # Pull to host numpy first. Read the LOCAL shard via
    # addressable_data(0): np.asarray on a non-fully-addressable array
    # dispatches a cross-process collective fetch with its own rendezvous,
    # while the local shard IS the full value for a replicated state.
    # On a multi-process mesh every process must call save() — orbax
    # runs an internal cross-process barrier — but only process 0 lands
    # the tensor data and sidecar files.
    tree = jax.tree.map(to_host, tree)
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() != 0:
        return path
    info = {"step": step, "epoch": epoch,
            "version": "yunet_tpu-0.1", "classes": ["FG"],
            "git": _git_hash(), "time": __import__("time").strftime(
                "%Y-%m-%d %H:%M:%S")}
    info.update(meta or {})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(info, f)
    with open(os.path.join(work_dir, "latest"), "w") as f:
        f.write(path)
    return path


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    latest = os.path.join(work_dir, "latest")
    if os.path.exists(latest):
        path = open(latest).read().strip()
        if os.path.isdir(path):
            return path
    if not os.path.isdir(work_dir):
        return None
    cands = [d for d in os.listdir(work_dir)
             if re.fullmatch(r"ckpt_\d+", d)]
    if not cands:
        return None
    return os.path.join(work_dir, max(cands))


def load_checkpoint(path: str, state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of ``state`` (a TrainState template)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "state": state.state,
                "opt_state": state.opt_state, "step": state.step}
    if state.ema_params is not None:
        template["ema_params"] = state.ema_params
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), template)
    restored = ckptr.restore(path, abstract)
    meta_path = os.path.join(path, "meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    new_state = state._replace(
        params=restored["params"], state=restored["state"],
        opt_state=restored["opt_state"], step=restored["step"],
        ema_params=restored.get("ema_params", state.ema_params))
    return new_state, meta
