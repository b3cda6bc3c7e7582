"""FeaturePrefetcher — async candidate-feature warming (SURVEY.md §7.1
mapping for the reference's on-critical-path HDF5 reads,
feature_db.py:18-31)."""
import numpy as np

from navillm_tpu.data.prefetch import FeaturePrefetcher


class _RecordingDB:
    def __init__(self, fail_on=()):
        self._store = {}
        self.calls = []
        self.fail_on = set(fail_on)

    def get_image_feature(self, scan, vp):
        self.calls.append((scan, vp))
        if (scan, vp) in self.fail_on:
            raise IOError("corrupt shard")
        return np.full((2, 4), 7.0, np.float32)


def _obs(*cands, scan="s0"):
    return [{"scan": scan,
             "candidate": [{"viewpointId": c} for c in cands]}]


def test_prefetch_warms_the_db_cache_with_matching_keys():
    db = _RecordingDB()
    pf = FeaturePrefetcher(db, workers=2)
    pf.prefetch_candidates(_obs("vpA", "vpB"))
    pf.drain()
    # the cache key must match ImageFeaturesDB.get_image_feature's
    # f"{scan}_{vp}" — a mismatch would make prefetch silently useless
    assert set(db._store) == {"s0_vpA", "s0_vpB"}
    np.testing.assert_allclose(db._store["s0_vpA"], 7.0)


def test_prefetch_dedups_within_a_call():
    db = _RecordingDB()
    pf = FeaturePrefetcher(db, workers=2)
    obs = _obs("vpA", "vpA") + _obs("vpA", scan="s0")
    pf.prefetch_candidates(obs)
    pf.drain()
    assert db.calls.count(("s0", "vpA")) == 1


def test_prefetch_respects_cache_limit():
    db = _RecordingDB()
    db._store = {f"k{i}": None for i in range(10)}
    pf = FeaturePrefetcher(db, workers=2, cache_limit=10)
    pf.prefetch_candidates(_obs("vpNew"))
    pf.drain()
    assert "s0_vpNew" not in db._store   # at the limit: no growth


def test_prefetch_errors_are_best_effort():
    db = _RecordingDB(fail_on={("s0", "vpBad")})
    pf = FeaturePrefetcher(db, workers=2)
    pf.prefetch_candidates(_obs("vpBad", "vpGood"))
    pf.drain()   # must not raise
    assert "s0_vpGood" in db._store
    assert "s0_vpBad" not in db._store
