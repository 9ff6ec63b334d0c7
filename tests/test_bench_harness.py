"""Tests for the bench.py harness itself (no Spark needed).

VERDICT r3 #1 and r4 #1: previous_round_warm() has been blind twice, once
per truncation geometry — r03's driver cut landed BEFORE the
"queries_warm" key (recoverable by matching the keyed object), r04's
landed INSIDE it (key gone, first entry's key half-eaten). The durable
fix is an in-repo complete record (bench_history/r{N}.json) that the
flagger prefers; tail recovery remains as the fallback for rounds that
predate the history. These tests pin every path against synthetic
geometries AND against whatever real driver artifact is present — never
against hardcoded values from one driver drop (the r4 failure mode).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _with_bench_files(tmp_path, monkeypatch, docs):
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    for name, doc in docs.items():
        (tmp_path / name).write_text(json.dumps(doc))


def test_parses_front_truncated_tail_key_survives(tmp_path, monkeypatch):
    # r03 geometry: cut lands before "queries_warm"; the key survives.
    tail = (
        '_lsh_pairs": 4.509}, "queries_warm": {"q01": 1.422, "q02": 0.529}, '
        '"total_warm": 1.951, "notes": "x"}\n'
    )
    _with_bench_files(
        tmp_path, monkeypatch, {"BENCH_r03.json": {"tail": tail, "parsed": None}}
    )
    got = bench.previous_round_warm()
    assert got == {"q01": 1.422, "q02": 0.529}


def test_parses_tail_cut_inside_queries_warm(tmp_path, monkeypatch):
    # r04 geometry: cut lands INSIDE queries_warm — the key itself and the
    # first entry's opening quote are gone. The half-eaten first pair must
    # drop; every complete pair before "total_warm" must be recovered.
    entries = {f"q{i:02d}_name": round(0.1 * i, 3) for i in range(1, 21)}
    body = ", ".join(f'"{k}": {v}' for k, v in entries.items())
    tail = (
        '04_cut_key": 0.437, '  # half-eaten first pair: no opening quote
        + body
        + '}, "total_warm": 25.03, "sf": 0.1, "cpus": 32, "notes": "x"}\n'
    )
    _with_bench_files(
        tmp_path, monkeypatch, {"BENCH_r04.json": {"tail": tail, "parsed": None}}
    )
    got = bench.previous_round_warm()
    assert got == entries
    assert len(got) >= 15
    assert "04_cut_key" not in got and "total_warm" not in got
    assert "sf" not in got and "cpus" not in got


def test_tail_cut_after_queries_warm_yields_empty(tmp_path, monkeypatch):
    # Cut landing past the warm object: no pairs before total_warm — the
    # fragment path must return {} rather than scraping scalar fields.
    tail = '"total_warm": 25.03, "sf": 0.1, "cpus": 32, "notes": "x"}\n'
    _with_bench_files(
        tmp_path, monkeypatch, {"BENCH_r04.json": {"tail": tail, "parsed": None}}
    )
    assert bench.previous_round_warm() == {}


def test_parses_untruncated_tail(tmp_path, monkeypatch):
    line = json.dumps(
        {"metric": "headline", "queries_warm": {"qx": 0.5}, "notes": "n"}
    )
    _with_bench_files(
        tmp_path, monkeypatch, {"BENCH_r01.json": {"tail": line, "parsed": None}}
    )
    assert bench.previous_round_warm() == {"qx": 0.5}


def test_prefers_driver_parsed_field(tmp_path, monkeypatch):
    _with_bench_files(
        tmp_path,
        monkeypatch,
        {
            "BENCH_r02.json": {
                "tail": "garbage",
                "parsed": {"queries_warm": {"qp": 9.0}},
            }
        },
    )
    assert bench.previous_round_warm() == {"qp": 9.0}


def test_history_preferred_over_driver_artifact(tmp_path, monkeypatch):
    # The in-repo complete record must win over ANY driver-artifact shape:
    # the driver file truncates with no completeness guarantee.
    _with_bench_files(
        tmp_path,
        monkeypatch,
        {
            "BENCH_r04.json": {
                "tail": "garbage with no recoverable object",
                "parsed": {"queries_warm": {"q_from_driver": 1.0}},
            }
        },
    )
    os.makedirs(tmp_path / "bench_history")
    (tmp_path / "bench_history" / "r04.json").write_text(
        json.dumps({"queries_warm": {"q_full_record": 2.0}})
    )
    assert bench.previous_round_warm() == {"q_full_record": 2.0}


def test_corrupt_history_falls_back_to_driver(tmp_path, monkeypatch):
    _with_bench_files(
        tmp_path,
        monkeypatch,
        {"BENCH_r04.json": {"parsed": {"queries_warm": {"qd": 3.0}}}},
    )
    os.makedirs(tmp_path / "bench_history")
    (tmp_path / "bench_history" / "r04.json").write_text("{not json")
    assert bench.previous_round_warm() == {"qd": 3.0}


def test_uses_latest_round(tmp_path, monkeypatch):
    _with_bench_files(
        tmp_path,
        monkeypatch,
        {
            "BENCH_r01.json": {"parsed": {"queries_warm": {"q": 1.0}}},
            "BENCH_r02.json": {"parsed": {"queries_warm": {"q": 2.0}}},
        },
    )
    assert bench.previous_round_warm() == {"q": 2.0}


def test_no_files_returns_empty(tmp_path, monkeypatch):
    _with_bench_files(tmp_path, monkeypatch, {})
    assert bench.previous_round_warm() == {}


def test_write_history_gated_on_driver_sf(tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    # local iteration at sf0.01 must NOT write (would poison the base)
    assert bench.write_history({"sf": 0.01, "queries_warm": {"q": 1}}, 5) is None
    assert not os.path.exists(tmp_path / "bench_history" / "r05.json")
    # the driver config (sf0.1) writes the complete doc
    doc = {"sf": 0.1, "queries_warm": {"q": 1.5}, "notes": "n" * 4096}
    path = bench.write_history(doc, 5)
    assert path == str(tmp_path / "bench_history" / "r05.json")
    assert json.load(open(path)) == doc


def test_real_latest_artifact_parses_nonempty():
    """Against the REAL repo artifacts (driver BENCH files + any committed
    bench_history), the flagger must see the previous round's warm times.
    No hardcoded values: the driver re-truncates at an arbitrary offset
    every round, so pinning one drop's numbers breaks on the next
    (the exact r4 failure). ≥15 entries is the VERDICT r4 'done' bar."""
    got = bench.previous_round_warm()
    assert len(got) >= 15, f"flagger recovered only {len(got)} warm entries"
    assert all(isinstance(v, float) and v > 0 for v in got.values())


def test_latest_driver_round_real_repo():
    # BENCH_r01..r04 are committed; the next history write must target
    # round >= 5 so it never clobbers a past round's record.
    assert bench._latest_driver_round() >= 4


def test_bench_queries_exist_in_catalog():
    """Every headline bench entry must be a declared catalog query — a
    rename in queries.py must fail here, not at the driver's bench run."""
    from osmapreduceproject_spark.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, missing
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_compact_record_fits_driver_tail_budget():
    """The driver keeps ~2000 bytes of stdout tail and parses the last
    line; the compact line must fit with margin, keep the slowest
    queries first, and point at the complete history record."""
    full = {
        "metric": "headline_queries_total_wall",
        "value": 209.123,
        "unit": "sec",
        "queries": {f"q{i:03d}_some_operator_name": round(0.3 + 0.01 * i, 3) for i in range(200)},
        "queries_warm": {f"q{i:03d}_some_operator_name": round(0.2 + 0.01 * i, 3) for i in range(200)},
        "total_warm": 180.5,
        "sf": 0.1,
        "cpus": 32,
        "notes": "n" * 20000,
        "reference": {"ref_sort_total_ms": 4, "ref_max_map_ms": 1},
        "sched_floor_s": 1.7,
        "history_file": "bench_history/r12.json",
    }
    rec = bench.compact_record(full)
    line = json.dumps(rec)
    assert len(line) <= 1800
    assert rec["metric"] == full["metric"] and rec["value"] == full["value"]
    assert rec["n_queries"] == 200
    assert rec["queries_omitted"] == 200 - len(rec["queries"])
    assert 0 < len(rec["queries"]) < 200
    # slowest-first: every included query is >= every omitted one
    included = set(rec["queries"])
    omitted_max = max(v for k, v in full["queries"].items() if k not in included)
    assert min(rec["queries"].values()) >= omitted_max
    # warm subset mirrors the included keys (prevents the tail-recovery
    # fallback from ever scraping cold times as warm)
    assert set(rec["queries_warm"]) <= included
    assert rec["history_file"] == "bench_history/r12.json"
    # and the line itself round-trips as the driver would parse it
    assert json.loads(line)["queries_omitted"] == rec["queries_omitted"]


def test_compact_record_small_suite_includes_everything():
    full = {
        "metric": "headline_queries_total_wall",
        "value": 3.0,
        "unit": "sec",
        "queries": {"q01": 1.0, "q02": 2.0},
        "queries_warm": {"q01": 0.9, "q02": 1.8},
        "total_warm": 2.7,
        "sf": 0.1,
        "cpus": 32,
        "reference": {},
        "sched_floor_s": 1.0,
    }
    rec = bench.compact_record(full)
    assert rec["queries"] == {"q02": 2.0, "q01": 1.0}
    assert rec["queries_warm"] == {"q02": 1.8, "q01": 0.9}
    assert rec["queries_omitted"] == 0
