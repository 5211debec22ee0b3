"""IntervalProfiler semantics (IntervalProfiler counterpart tests)."""

import time

from gaussiansplattingmlx_tpu.utils.profiler import IntervalProfiler


def test_nested_attribution():
    p = IntervalProfiler()
    with p.measure("outer"):
        time.sleep(0.02)
        with p.measure("inner"):
            time.sleep(0.03)
    outer = p.sections["outer"]
    inner = p.sections["inner"]
    assert outer.count == 1 and inner.count == 1
    # Outer total includes inner; outer self excludes it.
    assert outer.total >= inner.total
    assert outer.self_time < outer.total
    assert abs((outer.total - outer.self_time) - inner.total) < 5e-3


def test_report_and_reset():
    p = IntervalProfiler()
    for _ in range(3):
        with p.measure("a"):
            pass
    rep = p.report(top_k=5)
    assert "a" in rep and "section" in rep
    p.reset()
    assert not p.sections


def test_disabled_profiler_is_noop():
    p = IntervalProfiler(enabled=False)
    with p.measure("x"):
        pass
    assert not p.sections
