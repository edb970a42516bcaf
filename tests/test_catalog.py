"""CATALOG.md (the generated catalog index, VERDICT r7 item 8) must stay
in sync with plans/registry.py — a new/renamed/moved entry that isn't
regenerated turns the suite red here, not at the next judge pass.

The regeneration uses the correctness-file set NAMED IN the committed
file's header, so a driver-written CORRECTNESS_r0N.json landing between
rounds does not spuriously fail this test; structural columns (name,
family, file:line, oracle kind, bench pin) are always derived live."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_catalog import OUT, check  # noqa: E402


def test_catalog_md_in_sync_with_registry():
    assert check() is None


def test_catalog_md_covers_every_entry():
    from nfl_data_engineering_spark.plans.registry import CATALOG
    with open(OUT) as fh:
        body = fh.read()
    for q in CATALOG:
        assert f"| {q.name} |" in body, f"{q.name} missing from CATALOG.md"
