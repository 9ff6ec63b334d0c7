"""Catalog invariants — the contract between queries.py and the external
driver, pinned so a future rotation or addition can't silently break it:
the driver grades exactly the first 50 entries, hash-matching requires an
oracle, and the comparison is only as good as the catalog's hygiene."""

from __future__ import annotations

import re

from osmapreduceproject_spark.queries import QUERIES, _VERDICT_WINDOW


def test_window_is_exactly_50_and_fully_oracled():
    """Every driver-graded slot must carry a value-check: a rows-only
    entry inside the window wastes a scarce verdict on a weaker grade
    (q102's permanent no-oracle twin lives outside by design)."""
    assert len(_VERDICT_WINDOW) == 50, len(_VERDICT_WINDOW)
    assert len(set(_VERDICT_WINDOW)) == 50, "duplicate window entries"
    missing = [n for n in _VERDICT_WINDOW if n not in QUERIES]
    assert not missing, missing
    rows_only = [n for n in _VERDICT_WINDOW if QUERIES[n].oracle is None]
    assert not rows_only, f"rows-only entries occupy window slots: {rows_only}"


def test_window_leads_the_catalog():
    """_reorder_catalog must put the window first, in order — the driver
    takes the first 50 queries() entries, not a named list."""
    assert list(QUERIES)[:50] == list(_VERDICT_WINDOW)


def test_catalog_hygiene():
    """Names follow the q{N}_slug / conf_slug convention, every entry has
    a non-empty description, and oracles are non-empty SQL strings."""
    for name, spec in QUERIES.items():
        assert re.fullmatch(r"(q\d+_[a-z0-9_]+|conf_[a-z0-9_]+)", name), name
        assert (spec.doc or "").strip(), f"{name}: empty doc"
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), f"{name}: oracle has no SELECT"


def test_rows_only_set_is_the_documented_one():
    """The rows-only list is a deliberate, bounded set (sketches, RNG
    decode, engine-specific hash family) — growth here must be a
    conscious decision, not an oversight."""
    rows_only = {n for n, s in QUERIES.items() if s.oracle is None}
    # r5: q64/q97 left this set — the RAW8/PCM feature paths gained full
    # closed-form value oracles (VERDICT r4 #6). What remains: the two
    # sketch queries (engine-specific by design), the RNG-pixel resize,
    # and the xxhash64 bench twin (not DuckDB-expressible, permanent).
    assert rows_only == {
        "q51_approx_distinct",
        "q90_approx_quantiles",
        "q101_resize_images",
        "q102_minhash_xxhash",
    }, rows_only
