"""Progress reporting and phase timing."""
import io
import time

from fractencode_tpu.utils import NullReporter, PhaseTimer, StdoutReporter


def test_stdout_reporter_throttles():
    buf = io.StringIO()
    r = StdoutReporter(interval=10.0, stream=buf)
    r.log(1, 100)
    r.log(2, 100)  # throttled away
    r.log(100, 100)  # final always prints
    out = buf.getvalue()
    assert "1%" in out
    assert "2%" not in out
    assert "100%" in out


def test_stdout_reporter_rewinds():
    buf = io.StringIO()
    r = StdoutReporter(interval=0.0, stream=buf)
    r.log(10, 100)
    r.log(20, 100)
    assert "\b" in buf.getvalue()  # in-place rewrite like StdoutReporter2


def test_null_reporter():
    NullReporter().log(5, 10)  # no-op, no error


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.phases["a"] >= 0.01
    assert "a:" in t.report() and "total:" in t.report()