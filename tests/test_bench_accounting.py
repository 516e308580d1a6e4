"""Host-side bench accounting (bench.py::_finalize): unit handling of the
device-only shadow field and the record shape the driver parses.

The device_value field must shadow ``value`` in the SAME unit so
value-vs-device_value diffs across rounds isolate tunnel regressions
(VERDICT r2 item 10): throughput records get items/device-second, latency
records (unit "ms", the serving line) get device-only latency in ms.
"""

import bench


def _rec(unit, value, seconds, items=1, n_dispatches=1):
    return {
        "metric": "m", "value": value, "unit": unit, "config": 0,
        "items": items, "flops": 1e9, "bytes": 1e6, "seconds": seconds,
        "compile_s": 0.0, "n_dispatches": n_dispatches,
    }


def test_finalize_throughput_device_value(monkeypatch):
    monkeypatch.setattr(bench, "measure_dispatch_floor", lambda: 0.030)
    # 10 items in 0.130 s wall, 1 dispatch → 0.100 s device-only
    rec = bench._finalize(_rec("captions/s", 76.9, 0.130, items=10), {})
    assert rec["dispatch_floor_ms"] == 30.0
    assert abs(rec["device_seconds"] - 0.100) < 1e-9
    assert abs(rec["device_value"] - 100.0) < 1e-6  # items / device_seconds


def test_finalize_latency_device_value_in_ms(monkeypatch):
    monkeypatch.setattr(bench, "measure_dispatch_floor", lambda: 0.030)
    # serving-style record: value is ms, device_value must be ms too
    rec = bench._finalize(_rec("ms", 90.0, 0.090), {})
    assert abs(rec["device_seconds"] - 0.060) < 1e-9
    assert rec["device_value"] == 60.0  # ms, same unit as value


def test_finalize_pipelined_skips_device_fields(monkeypatch):
    monkeypatch.setattr(
        bench, "measure_dispatch_floor",
        lambda: (_ for _ in ()).throw(AssertionError("must not be called")))
    r = _rec("captions/s", 5.0, 1.0)
    r["pipelined_host_scoring"] = True
    rec = bench._finalize(r, {})
    assert "device_value" not in rec and "device_seconds" not in rec


def test_finalize_vs_baseline_anchor():
    rec = _rec("captions/s", 200.0, 1.0)
    rec["pipelined_host_scoring"] = True  # skip device probe
    out = bench._finalize(rec, {"m": 100.0})
    assert out["vs_baseline"] == 2.0
    rec2 = _rec("captions/s", 200.0, 1.0)
    rec2["pipelined_host_scoring"] = True
    assert bench._finalize(rec2, {})["vs_baseline"] is None
