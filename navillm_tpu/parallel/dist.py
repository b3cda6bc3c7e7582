"""Multi-host helpers: object all-gather for eval prediction merging.

Replaces the reference's pickle-padded torch all_gather
(tools/common_utils.py:105-166): each host's predictions are pickled,
padded to the global max length, exchanged with
`multihost_utils.process_allgather` (uint8 arrays over the mesh), and
unpickled. Single-process runs short-circuit with zero overhead.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def all_gather_objects(obj: Any) -> List[Any]:
    import jax
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    local_len = np.asarray([payload.shape[0]], np.int64)
    all_lens = multihost_utils.process_allgather(local_len)
    max_len = int(np.max(all_lens))
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.shape[0]] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(gathered.shape[0]):
        n = int(all_lens[i][0] if all_lens.ndim > 1 else all_lens[i])
        out.append(pickle.loads(gathered[i, :n].tobytes()))
    return out


def merge_dist_results(results: List[List[Any]]) -> List[Any]:
    """Flatten per-rank prediction lists (reference train.py:177-181)."""
    out = []
    for res in results:
        out.extend(res)
    return out
