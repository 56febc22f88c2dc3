"""Cross-process communication utilities.

Rebuild of pcdet/utils/commu_utils.py (NCCL pickle-tensor all_gather,
reduce_dict, average_reduce_value) on the jax multi-host model: inside
jit/pjit, reductions are plain jnp ops over sharded axes; HOST-side
aggregation (eval result merge, timing averages) uses
jax.experimental.multihost_utils — no filesystem rendezvous
(common_utils.py:202-223 in the reference) and no pickle-over-NCCL.
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


def get_world_size() -> int:
    import jax
    return jax.process_count()


def get_rank() -> int:
    import jax
    return jax.process_index()


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from all processes (reference
    commu_utils.all_gather)."""
    import jax
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils
    import pickle
    buf = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    # pad to the max size across hosts
    size = np.array([buf.size], np.int32)
    sizes = multihost_utils.process_allgather(size).reshape(-1)
    maxlen = int(sizes.max())
    padded = np.zeros((maxlen,), np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(gathered[i, : int(sizes[i])].tobytes()))
    return out


def average_reduce_value(value: float) -> float:
    """Mean of a python scalar across processes (reference
    commu_utils.average_reduce_value)."""
    import jax
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(
        np.asarray([value], np.float64)).reshape(-1)
    return float(vals.mean())


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    import jax
    if jax.process_count() == 1:
        return dict(d)
    keys = sorted(d.keys())
    vals = np.asarray([float(d[k]) for k in keys], np.float64)
    from jax.experimental import multihost_utils
    allv = multihost_utils.process_allgather(vals)
    red = allv.mean(0) if average else allv.sum(0)
    return {k: float(v) for k, v in zip(keys, red)}


def merge_results_dist(results: List[Any], total_size: int = None) -> List[Any]:
    """Merge per-process eval result lists (replaces the pickle-tmpdir
    gather of common_utils.merge_results_dist): interleaved rank-sharded
    order is restored."""
    gathered = all_gather(results)
    world = len(gathered)
    merged: List[Any] = []
    maxlen = max(len(g) for g in gathered)
    for i in range(maxlen):
        for r in range(world):
            if i < len(gathered[r]):
                merged.append(gathered[r][i])
    if total_size is not None:
        merged = merged[:total_size]
    return merged
