"""Registry + StageTimer units (utils/registry.py, utils/profiling.py)."""
import pytest

from navillm_tpu.utils.profiling import StageTimer, trace
from navillm_tpu.utils.registry import Registry


def test_registry_register_get_build_and_errors():
    reg = Registry("widget")

    @reg.register("a")
    class A:
        def __init__(self, x):
            self.x = x

    assert "a" in reg and "b" not in reg
    assert reg.get("a") is A
    assert A.name == "a"
    assert reg.build("a", 5).x == 5
    with pytest.raises(KeyError, match="unknown widget 'b'"):
        reg.get("b")
    with pytest.raises(KeyError, match="duplicate"):
        reg.register("a")(A)
    assert sorted(reg.keys()) == ["a"]


def test_stage_timer_aggregates_and_resets():
    t = StageTimer()
    for _ in range(3):
        with t.stage("alpha"):
            pass
    with t.stage("beta"):
        pass
    s = t.summary()
    assert s["alpha"]["count"] == 3 and s["beta"]["count"] == 1
    assert s["alpha"]["total_s"] >= 0
    rep = t.report()
    assert "alpha" in rep and "ms/call" in rep
    t.reset()
    assert t.summary() == {}


def test_stage_timer_counts_on_exception():
    t = StageTimer()
    with pytest.raises(ValueError):
        with t.stage("boom"):
            raise ValueError
    assert t.summary()["boom"]["count"] == 1


def test_trace_none_is_noop():
    with trace(None):
        pass   # must not touch jax
