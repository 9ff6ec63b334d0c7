"""Tests for the bench.py harness itself (no Spark needed).

VERDICT r3 finding #1: previous_round_warm() silently returned {} on the
driver's FRONT-truncated BENCH tail, disabling round-over-round regression
flagging. These tests pin the recovery paths.
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


def test_parses_front_truncated_tail(tmp_path, monkeypatch):
    tail = (
        '_lsh_pairs": 4.509}, "queries_warm": {"q01": 1.422, "q02": 0.529}, '
        '"total_warm": 1.951, "notes": "x"}\n'
    )
    _with_bench_files(
        tmp_path, monkeypatch, {"BENCH_r03.json": {"tail": tail, "parsed": None}}
    )
    got = bench.previous_round_warm()
    assert got == {"q01": 1.422, "q02": 0.529}


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


def test_real_r03_file_parses_nonempty():
    """The actual driver-written BENCH_r03.json must yield warm numbers."""
    got = bench.previous_round_warm()
    assert len(got) >= 20
    assert got["q01_pricing_summary"] == 1.422
