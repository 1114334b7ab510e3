"""Checkpoint store: atomic bundle save/load.

Mirrors the reference checkpoint surface:
  - LM bundle {model, optimizer, scheduler/progress, config, phn2num}
    saved as one file (``steps/trainer.py:220-241``),
  - atomic write via tmp+rename, the corruption protection of
    ``audiocraft/audiocraft/utils/checkpoint.py:98-161``,
  - keep-last-N flushing (checkpoint.py:104-122).

Format: a pickle of numpy-ified pytrees — host-portable, no framework pin.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, List, Optional

import numpy as np


def _to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_bundle(path: str, **entries) -> None:
    """Atomically write a checkpoint bundle (tmp + rename)."""
    payload = {k: _to_numpy(v) for k, v in entries.items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_bundle(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_step_checkpoint(dirpath: str, step: int, keep_last: int = 3, **entries):
    """Numbered checkpoints with keep-last-N flushing
    (reference checkpoint.py:104-122)."""
    os.makedirs(dirpath, exist_ok=True)
    save_bundle(os.path.join(dirpath, f"ckpt_{step:08d}.pkl"), **entries)
    cks = sorted(
        f for f in os.listdir(dirpath) if re.fullmatch(r"ckpt_\d+\.pkl", f)
    )
    for old in cks[:-keep_last]:
        os.remove(os.path.join(dirpath, old))


def save_sharded(path: str, tree) -> None:
    """Sharded (multi-host/FSDP-safe) checkpoint via orbax: each host writes
    only its addressable shards — the TPU-native replacement for the
    reference's rank-sharded .tmp/.tmp.done protocol
    (audiocraft utils/checkpoint.py:125-161)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_sharded(path: str, template=None):
    """Restore an orbax checkpoint; ``template`` (abstract arrays with
    shardings) re-shards onto the current mesh."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(dirpath: str) -> Optional[str]:
    if not os.path.isdir(dirpath):
        return None
    cks = sorted(
        f for f in os.listdir(dirpath) if re.fullmatch(r"ckpt_\d+\.pkl", f)
    )
    return os.path.join(dirpath, cks[-1]) if cks else None
