"""Async feature prefetch: warm the next step's viewpoint features.

The SURVEY.md §7.1 mapping for the reference's per-step HDF5 reads
(feature_db.py:18-31, read on the critical path at mp3d_agent.py:939):
while the device runs the LLM step, a worker pool fetches the features
of every *candidate* viewpoint of the current observations — the
superset of wherever the policy can move next — into the feature-db
cache, so the post-action get_obs is a warm-cache hit.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Sequence, Set, Tuple


class FeaturePrefetcher:
    def __init__(self, feat_db, workers: int = 4, cache_limit: int = 4096):
        self.feat_db = feat_db
        self.pool = ThreadPoolExecutor(workers)
        self.cache_limit = cache_limit
        self._pending = []

    def _fetch(self, scan: str, vp: str):
        try:
            store = getattr(self.feat_db, "_store", None)
            if store is not None and len(store) >= self.cache_limit:
                return
            ft = self.feat_db.get_image_feature(scan, vp)
            if store is not None:
                store[f"{scan}_{vp}"] = ft
        except Exception:
            pass    # prefetch is best-effort; real read will surface errors

    def prefetch_candidates(self, obs: Sequence[dict]):
        """Kick off async fetches for all candidate viewpoints."""
        seen: Set[Tuple[str, str]] = set()
        for ob in obs:
            for cand in ob.get("candidate", []):
                key = (ob["scan"], cand["viewpointId"])
                if key not in seen:
                    seen.add(key)
                    self._pending.append(self.pool.submit(self._fetch, *key))
        # trim completed futures
        self._pending = [f for f in self._pending if not f.done()]

    def drain(self):
        for f in self._pending:
            f.result()
        self._pending = []
