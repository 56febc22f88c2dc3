"""ctypes bindings for the native C++ data-IO runtime (csrc/dataio.cpp).

Builds the shared library on first use (make -C csrc); falls back to the
numpy path transparently when a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False
_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _CSRC / "libcagroup_dataio.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.load_batch.restype = ctypes.c_long
        lib.load_bin_f32.restype = ctypes.c_long
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def load_batch(point_paths: List[str], point_cap: int,
               ins_paths: Optional[List[str]] = None,
               sem_paths: Optional[List[str]] = None,
               seed: int = 0):
    """Threaded read + subsample + pad.  Returns (points [B, P, 6],
    valid [B, P], ins i32[B, P]|None, sem i32[B, P]|None)."""
    lib = _load()
    B = len(point_paths)
    points = np.zeros((B, point_cap, 6), np.float32)
    valid = np.zeros((B, point_cap), np.uint8)
    ins = np.zeros((B, point_cap), np.int32) if ins_paths else None
    sem = np.zeros((B, point_cap), np.int32) if sem_paths else None
    if lib is None:
        # numpy fallback
        rng = np.random.RandomState(seed)
        for b, p in enumerate(point_paths):
            pts = np.fromfile(p, np.float32).reshape(-1, 6)
            n = len(pts)
            ins_b = np.fromfile(ins_paths[b], np.int64).astype(np.int32) \
                if ins_paths else None
            sem_b = np.fromfile(sem_paths[b], np.int64).astype(np.int32) \
                if sem_paths else None
            if n > point_cap:
                ch = rng.choice(n, point_cap, replace=False)
                pts = pts[ch]
                ins_b = ins_b[ch] if ins_b is not None else None
                sem_b = sem_b[ch] if sem_b is not None else None
                n = point_cap
            points[b, :n] = pts
            valid[b, :n] = 1
            if ins_b is not None:
                ins[b, :n] = ins_b[:n]
            if sem_b is not None:
                sem[b, :n] = sem_b[:n]
        return points, valid.astype(bool), ins, sem

    def carr(paths):
        if paths is None:
            return None
        arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
        return arr

    pp = carr(point_paths)
    ip = carr(ins_paths)
    sp = carr(sem_paths)
    ok = lib.load_batch(
        pp, ip, sp, ctypes.c_long(B), ctypes.c_long(point_cap),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if ins is not None
        else None,
        sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if sem is not None
        else None,
        ctypes.c_uint64(seed))
    if ok != B:
        raise IOError(f"native load_batch read {ok}/{B} scenes")
    return points, valid.astype(bool), ins, sem
