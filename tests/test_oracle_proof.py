"""Stale-oracle-proof guard (VERDICT r07 item 8).

``scripts/oracle_proven_hashes.json`` records the sha256 of each query's
oracle SQL as of its last DRIVER-green hash row (maintained by
``scripts/update_proven_hashes.py``, run once per round when the new
CORRECTNESS record lands). This test fails when any driver-green query's
CURRENT oracle differs from its last-proven hash unless the query sits
in the LATEST ``JUDGE_PINS`` cohort — i.e. editing an oracle without
pinning the query for a same-round driver re-proof is now a suite
failure, not a judge-vigilance item. The r06 Lorenz red and the r07
13-query stale cohort were both exactly this failure mode.
"""

from __future__ import annotations

import json
import os

from cudf_spark.queries import (
    JUDGE_PINS,
    REGISTRY,
    _driver_records,
    _repo_root,
)
from scripts.update_proven_hashes import HASH_PATH, oracle_hash


def _proven() -> dict[str, str]:
    with open(HASH_PATH) as fh:
        return json.load(fh)


def test_proven_hash_file_exists_and_is_clean():
    assert os.path.exists(HASH_PATH), (
        "run scripts/update_proven_hashes.py after the driver commits a "
        "CORRECTNESS record"
    )
    proven = _proven()
    unknown = set(proven) - set(REGISTRY)
    assert unknown == set(), f"proven-hash entries for unregistered queries: {unknown}"
    rows_only = {n for n in proven if REGISTRY[n].oracle is None}
    assert rows_only == set(), f"proven-hash entries for rows-only queries: {rows_only}"


def test_every_green_oracle_is_proven_or_pinned():
    """A driver-green, oracle-backed query must either carry its proven
    hash unchanged, or be pinned in the LATEST JUDGE_PINS cohort (the
    re-proof path). Anything else is an oracle edit shipping without a
    scheduled driver re-check."""
    proven = _proven()
    _, _, green = _driver_records(_repo_root)
    latest_pins = JUDGE_PINS[max(JUDGE_PINS)]
    stale: dict[str, str] = {}
    for name in sorted(green):
        q = REGISTRY.get(name)
        if q is None or q.oracle is None or name in latest_pins:
            continue
        current = oracle_hash(q.oracle)
        if proven.get(name) != current:
            stale[name] = (
                "oracle edited since last driver proof"
                if name in proven
                else "green but never recorded as proven"
            )
    assert stale == {}, (
        "oracle changed without a same-round JUDGE_PINS entry — add the "
        f"query to JUDGE_PINS[{max(JUDGE_PINS)}] (or a new cohort) in the "
        f"same commit: {stale}"
    )


def test_latest_pins_cover_all_unproven_green_oracles():
    """Inverse direction: the latest cohort should be the ONLY place a
    green query's oracle may differ from its proven hash — and every
    pinned member must exist in the registry (covered by test_rotation
    too, but cheap to re-assert next to the mechanism that relies on
    it)."""
    latest_pins = JUDGE_PINS[max(JUDGE_PINS)]
    assert latest_pins <= set(REGISTRY)
