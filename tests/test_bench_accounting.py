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


def test_main_flagship_failure_keeps_headline_metric(monkeypatch, capsys):
    """Driver contract: the FINAL stdout JSON line must always carry the
    flagship metric name — on flagship failure it is an error record with
    value null and the process exits non-zero, never the serving line."""
    import json

    import pytest

    ok = {"metric": "x", "value": 1.0, "unit": "u", "config": 0, "items": 1,
          "flops": 1.0, "bytes": 1.0, "seconds": 1.0, "compile_s": 0.0,
          "pipelined_host_scoring": True}
    for name in ("bench_greedy", "bench_train_step", "bench_diverse_oracle",
                 "bench_e2e", "bench_serving_latency"):
        monkeypatch.setattr(bench, name, lambda **kw: dict(ok))
    # the overlapped config-1 warm-up thread must not build the real
    # full-dims program in a unit test
    monkeypatch.setattr(
        bench, "build_greedy_decode",
        lambda *a, **k: ((lambda *x: (0, 0.0)), (0, 0, 0, 0)))
    monkeypatch.setattr(
        bench, "bench_tpu_cbs",
        lambda: (_ for _ in ()).throw(RuntimeError("tunnel down")))
    monkeypatch.setattr(bench, "enable_compile_cache", lambda: "",
                        raising=False)
    import style_seqcvae_tpu.utils.cache as cache
    monkeypatch.setattr(cache, "enable_compile_cache", lambda: "")
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 6
    last = lines[-1]
    assert last["metric"] == "cbs_beam5_captions_per_sec_per_chip"
    assert last["value"] is None and "tunnel down" in last["error"]


def test_finalize_vs_baseline_anchor():
    rec = _rec("captions/s", 200.0, 1.0)
    rec["pipelined_host_scoring"] = True  # skip device probe
    out = bench._finalize(rec, {"m": 100.0})
    assert out["vs_baseline"] == 2.0
    rec2 = _rec("captions/s", 200.0, 1.0)
    rec2["pipelined_host_scoring"] = True
    assert bench._finalize(rec2, {})["vs_baseline"] is None
