"""bench.py metric-label honesty: the scale tag must describe what the
measured run actually executed, not which flags were passed. The kv8
tag in particular gates an A/B sweep decision (scripts/
bench_kv8_sweep.sh), so a mislabeled point would adopt or reject the
int8 KV cache on the wrong evidence."""
import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench


def _args(**kw):
    base = dict(debug=False, mode="rollout", model="7b", quant=None,
                a8=False, kv8=False, prefix_cache=False)
    base.update(kw)
    return SimpleNamespace(**base)


def test_kv8_tag_requires_an_actual_int8_cache():
    # rollout without --prefix_cache has no prefix cache at all: --kv8
    # is inert and must not appear in the label
    assert not bench._kv8_engaged(_args(kv8=True, mode="rollout"))
    assert "kv8" not in bench._scale_tag(_args(kv8=True, mode="rollout"))
    # rollout with the prefix cache: engaged
    assert bench._kv8_engaged(_args(kv8=True, mode="rollout",
                                    prefix_cache=True))
    assert "kv8" in bench._scale_tag(_args(kv8=True, mode="rollout",
                                           prefix_cache=True))
    # decode always has a prompt K/V stack: engaged
    assert bench._kv8_engaged(_args(kv8=True, mode="decode"))
    # training modes have no int8 K/V cache: inert
    assert not bench._kv8_engaged(_args(kv8=True, mode="train_e2e"))
    assert not bench._kv8_engaged(_args(kv8=True, mode="train_step"))
    # and without the flag, never
    assert not bench._kv8_engaged(_args(mode="decode"))


def test_scale_tag_headline_forms():
    assert bench._scale_tag(_args(model="7b", quant=True, a8=True,
                                  prefix_cache=True, kv8=True)) \
        == "Vicuna-7B dims int8-w8a8 kv8"
    assert bench._scale_tag(_args(model="proxy", mode="train_e2e")) \
        == "1.3B proxy"
    # int4 weights get their own tag so sweep points are unambiguous
    assert bench._scale_tag(_args(model="7b", quant=True, w4=True)) \
        == "Vicuna-7B dims int4"
    assert bench._scale_tag(_args(model="7b", quant=True, w4=True,
                                  a8=True)) \
        == "Vicuna-7B dims int4-w4a8"


def test_stale_partial_is_cleared_before_watchdog(tmp_path, monkeypatch):
    """_unlink_partial removes a previous run's BENCH_PARTIAL.json so a
    mid-calibration hang can't promote last round's anchors as this
    run's result."""
    monkeypatch.chdir(tmp_path)
    p = tmp_path / "BENCH_PARTIAL.json"
    p.write_text('{"rollout_7b": {"value": 999}}')
    bench._unlink_partial()
    assert not p.exists()
    bench._unlink_partial()  # idempotent on a missing file
