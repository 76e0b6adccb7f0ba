"""Unit tests for bench.py's artifact-delivery machinery.

bench.py is the driver's only window into this framework's performance;
round 3 lost its entire record to a timeout, so the delivery logic itself
(progressive emission, resolve-order scheduling, contended-value renaming,
budget skips) is now under test.  The measurement bodies need the TPU and
are exercised by the verify recipe, not here — these tests drive
run_device_sections/emit with stub futures and stub measure functions.
"""
import json
import os
import sys
import threading
import time
from concurrent.futures import Future

import pytest

# bench.py lives at the repo root (a bare `pytest tests/` doesn't put it on
# sys.path the way `python -m pytest` does)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_bench_state():
    bench.RESULTS.clear()
    bench.SECTIONS_S.clear()
    bench.SKIPPED.clear()
    bench.WANTED.clear()
    bench.T_START = time.perf_counter()
    bench.BUDGET_S = 60.0
    yield
    bench.RESULTS.clear()
    bench.SECTIONS_S.clear()
    bench.SKIPPED.clear()
    bench.WANTED.clear()


def _done(value=None) -> Future:
    f = Future()
    f.set_result(value)
    return f


def _want_all(name):
    return True


def test_emit_headline_shape_and_final(capsys):
    bench.RESULTS["detect_fps"] = 1400.0
    bench.emit()
    bench.emit(final=True)
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    for line in lines:
        assert line["metric"] == "detect_fps_416_bf16_per_chip"
        assert line["value"] == 1400.0
        assert line["unit"] == "frames/sec"
        assert line["vs_baseline"] == round(1400.0 / bench.REFERENCE_FPS, 3)
    assert "final" not in lines[0]
    assert lines[1]["final"] is True


def test_emit_final_names_unresolved_sections_as_skipped(capsys):
    """A final/aborted dump must name every wanted-but-unmeasured section in
    `skipped` — the r5 cold-service validation showed a SIGTERM landing
    before the internal budget left the lost sections unreported."""
    bench.WANTED.extend(["detect", "temporal_k3", "stream", "loader"])
    bench.SECTIONS_S["detect"] = 5.0
    bench.RESULTS["detect_fps"] = 2000.0
    bench.RESULTS["stream_error"] = "ValueError('x')"
    bench.SKIPPED.append("loader")
    bench.emit()  # progress line: pending sections are NOT skipped yet
    bench.emit(final=True, aborted="SIGTERM")
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert lines[0].get("skipped") == ["loader"]  # only the explicit skip
    # final: unresolved temporal_k3 appears; measured detect and errored
    # stream do not; no duplicates for the explicit loader skip
    assert lines[1]["skipped"] == ["loader", "temporal_k3"]
    assert lines[1]["aborted"] == "SIGTERM"


def test_emit_headline_falls_back_to_contended_lower_bound(capsys):
    """detect now compiles in the pool like every section, so a run killed
    before the idle re-measure may only have detect_fps_contended — the
    headline value must carry that lower bound (flagged), never null."""
    bench.RESULTS["detect_fps_contended"] = 900.0
    bench.emit()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 900.0
    assert line["value_is_contended_lower_bound"] is True
    assert line["vs_baseline"] == round(900.0 / bench.REFERENCE_FPS, 3)
    # the clean idle value wins once present
    bench.RESULTS["detect_fps"] = 1400.0
    bench.emit()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 1400.0
    assert "value_is_contended_lower_bound" not in line


def test_emit_survives_concurrent_mutation(capsys):
    """The watchdog thread emits while the main thread mutates RESULTS;
    emit must never die on 'dictionary changed size during iteration'
    (that would silently disarm the budget+30 guaranteed-exit defence)."""
    stop = threading.Event()

    def mutate():
        i = 0
        while not stop.is_set():
            bench.RESULTS[f"k{i % 40}"] = i
            bench.RESULTS.pop(f"k{(i + 20) % 40}", None)
            bench.SECTIONS_S[f"s{i % 10}"] = float(i)
            i += 1

    t = threading.Thread(target=mutate)
    t.start()
    try:
        for _ in range(500):
            bench.emit()
    finally:
        stop.set()
        t.join()
    for ln in capsys.readouterr().out.strip().splitlines():
        json.loads(ln)  # every line parseable


def test_emit_reentrant_from_signal_handler(capsys):
    """A SIGTERM landing while the main thread is inside emit() re-enters
    emit() on the same thread — the lock must be reentrant or all three
    timeout defences deadlock at once."""
    with bench._EMIT_LOCK:
        bench.emit(final=True, aborted="SIGTERM")
    line = json.loads(capsys.readouterr().out.strip())
    assert line["aborted"] == "SIGTERM"


def test_slow_high_priority_does_not_starve_resolved_sections(capsys):
    """One slow/stuck high-priority compile must not block already-resolved
    lower-priority sections (the r3 lose-everything failure mode): measures
    run in resolve order, priority only breaks ties among the ready."""
    slow = Future()  # int8: never set until the last fast section measures
    order = []

    def fast_measure(key):
        def m(prep):
            order.append(key)
            bench.RESULTS[key] = 1.0
            if key == "stream_fps":  # last fast section releases the slow one
                slow.set_result("int8prep")

        return m

    def slow_measure(prep):
        assert prep == "int8prep"
        order.append("int8_fps")
        bench.RESULTS["int8_fps"] = 2.0

    futures = {"int8": slow, "temporal": _done(), "stream": _done()}
    measures = [
        ("int8", slow_measure),  # highest priority, but unresolved
        ("temporal", fast_measure("temporal_fps")),
        ("stream", fast_measure("stream_fps")),
    ]
    bench.run_device_sections(futures, measures, _want_all)
    assert order == ["temporal_fps", "stream_fps", "int8_fps"]
    # fast sections measured while int8 was in flight -> contended names;
    # int8 measured idle -> real name
    assert "temporal_fps_contended" in bench.RESULTS
    assert "stream_fps_contended" in bench.RESULTS
    assert bench.RESULTS["int8_fps"] == 2.0
    assert "int8_fps_contended" not in bench.RESULTS
    assert not bench.SKIPPED
    # a full line was emitted after every section
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3
    json.loads(lines[-1])


def test_exception_mid_measure_renames_partial_keys(capsys):
    """A measure that writes one key then raises (while other compiles are
    in flight) must not leave the written key under its clean name — the
    rename runs in a finally; the *_error key itself is never renamed."""
    in_flight = Future()  # keeps the run contended throughout

    def partial_measure(prep):
        bench.RESULTS["latency_bf16_ms"] = 3.0
        raise RuntimeError("int8 chain fell over")

    futures = {"latency": _done(), "other": in_flight}
    measures = [("latency", partial_measure)]
    bench.run_device_sections(futures, measures, _want_all)
    in_flight.set_result(None)
    assert "latency_bf16_ms" not in bench.RESULTS
    assert bench.RESULTS["latency_bf16_ms_contended"] == 3.0
    assert "fell over" in bench.RESULTS["latency_error"]
    assert "latency" not in bench.SECTIONS_S  # failed sections aren't 'done'


def test_budget_expiry_skips_unresolved(capsys):
    """Sections whose compile has not resolved when the budget expires are
    reported in skipped — never silently dropped."""
    bench.T_START = time.perf_counter() - bench.BUDGET_S - 1  # already over
    futures = {"int8": Future(), "train": Future()}
    measures = [("int8", lambda p: None), ("train", lambda p: None)]
    bench.run_device_sections(futures, measures, _want_all)
    assert bench.SKIPPED == ["int8", "train"]
    assert not bench.RESULTS


def test_missing_prerequisite_lands_in_skipped(capsys):
    """BENCH_ONLY=latency without int8 never creates the latency future;
    the section must land in skipped, not vanish."""
    futures = {}
    measures = [("latency", lambda p: None)]
    bench.run_device_sections(futures, measures, lambda n: n == "latency")
    assert bench.SKIPPED == ["latency"]
