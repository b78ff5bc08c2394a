"""Regression tests for the round-11 fuzz-differential findings.

Each test replays the EXACT seed that exposed the defect (the generator
is fully seed-deterministic) restricted to the queries that failed, via
the harness's own runner — so a regression reproduces the original
MISMATCH/ERROR verbatim. Fixture trees are generated into a tmp dir and
removed; each seed runs in a couple of seconds at the generator's
~sf0.001 scale.

Findings covered (see scripts/fuzz_differential.py and JUDGE_PINS[11]):
  seed 1  replace_nan_handling        oracle isnan(NULL) vs cudf BOOL8
  seed 1  misc_consistent_hash_ring   ANSI element_at on empty ring
  seed 2  stream_checkpoint_exactly_once  <2 part files assert, NULL xor
  seed 2  io_avro_roundtrip_agg       empty frame -> zero avro parts
  seed 4  stats_cramers_v             empty table chi2 0.0 vs NULL
  seed 5  win_rolling_mode            NULL tie order nulls-first/last
  seed 5  events_rfm_scores           NULL monetary rank fork
"""

from __future__ import annotations

import pytest

SEED_QUERIES = [
    (1, ["replace_nan_handling", "misc_consistent_hash_ring"]),
    (2, ["stream_checkpoint_exactly_once", "io_avro_roundtrip_agg"]),
    (4, ["stats_cramers_v"]),
    (5, ["win_rolling_mode", "events_rfm_scores"]),
]


@pytest.mark.parametrize("seed,names", SEED_QUERIES, ids=lambda v: str(v))
def test_fuzz_finding_seed(spark, seed, names):
    if isinstance(seed, list):  # parametrize id helper quirk guard
        pytest.skip("param order")
    from scripts.fuzz_differential import run_seed

    report = run_seed(spark, seed, size=0, keep=False, only=set(names))
    assert report["mismatch"] == [], report["mismatch"]
    assert report["error"] == [], report["error"]
    assert report["ok"] == len(names)
