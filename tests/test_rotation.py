"""Check-window rotation: round 3 used a hand-curated priority list;
from round 4 on (CORRECTNESS_r03.json present) the order derives from the
driver's own records — red rows first, never-checked next, green last.

These tests read the SAME ``_driver_records`` helper the registry's
rotation reads (no hardcoded round ranges): rounds 3 and 4 each rotted a
version of this file that re-derived the checked set with its own
``range(1, N)`` loop, which desynchronized the moment the driver wrote
the next CORRECTNESS file.
"""

from __future__ import annotations

import json
import shutil

from cudf_spark.queries import (
    JUDGE_PINS,
    REGISTRY,
    _ROUND3_PRIORITY,
    _driver_records,
    _repo_root,
    _rotation_from_driver_records,
)

ROUND3_NEW = {
    "dedup_substring_exact",
    "agg_sketch_merge",
    "ewma_global_segmented",
    "dedup_duplicate_clusters",
    "doc_domain_mix",
    "dictionary_update_keys",
    "mm_audio_features",
    "stream_stateful_totals",
    "doc_chunk_overlap",
    "emb_quantize_int8",
    "agg_var_ddof",
    "doc_weighted_sample",
}


def test_rotation_mode_matches_driver_records():
    import os

    paths, checked, green = _driver_records(_repo_root)
    dynamic = any(
        os.path.basename(p) >= "CORRECTNESS_r03.json" for p in paths
    )
    if dynamic:
        order = _rotation_from_driver_records(_repo_root)
        assert order is not None and set(order) == set(REGISTRY)
        never = [q for q in REGISTRY if q not in checked]
        red = [q for q in REGISTRY if q in checked and q not in green]
        repin = [
            q for q in REGISTRY if q in JUDGE_PINS[max(JUDGE_PINS)] and q in green
        ]
        # red rows lead the window; the latest judge-pin cohort (green
        # included — oracle-upgrade re-proofs) comes next; every
        # never-checked query follows, ahead of the whole green tail
        assert order[: len(red)] == sorted(red, key=list(REGISTRY).index)
        assert set(order[len(red) : len(red) + len(repin)]) == set(repin)
        head = len(red) + len(repin)
        assert set(order[head : head + len(never)]) == set(never)
    else:
        assert list(REGISTRY)[:50] == _ROUND3_PRIORITY
        assert _rotation_from_driver_records(_repo_root) is None


def test_dynamic_rotation_from_synthetic_records(tmp_path):
    for src in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        shutil.copy(f"{_repo_root}/{src}", tmp_path)
    r03 = {
        n: {"hash_match": True, "err": None, "spark_rows": 5}
        for n in _ROUND3_PRIORITY
    }
    r03["q17_small_quantity_revenue"] = {
        "hash_match": False,
        "err": None,
        "spark_rows": 5,
    }
    # fabricate a green row for one latest-cohort member (NOT in
    # ROUND3_NEW, whose members must stay never-checked below) so the
    # repin branch (green + latest pin -> re-enter window) is exercised.
    # Picked dynamically: a hardcoded name went stale the moment a new
    # JUDGE_PINS cohort landed without it (round 10).
    pin_member = sorted(JUDGE_PINS[max(JUDGE_PINS)] - ROUND3_NEW)[0]
    r03[pin_member] = {
        "hash_match": True,
        "err": None,
        "spark_rows": 5,
    }
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(r03))

    order = _rotation_from_driver_records(str(tmp_path))
    assert order is not None and set(order) == set(REGISTRY)
    # the red row re-checks first; the latest judge-pin cohort's GREEN
    # members come next; every never-checked query lands after, ahead of
    # every green query
    assert order[0] == "q17_small_quantity_revenue"
    _, checked, green = _driver_records(str(tmp_path))
    repin = {q for q in JUDGE_PINS[max(JUDGE_PINS)] if q in green}
    assert pin_member in repin
    assert repin == set(order[1 : 1 + len(repin)])
    never = {q for q in REGISTRY if q not in checked}
    assert ROUND3_NEW <= never
    head = 1 + len(repin)
    assert never == set(order[head : head + len(never)])


def test_judge_pins_cohorts():
    """VERDICT r06 item 8: every pin cohort name must exist in the
    registry (a renamed/deleted query would silently unpin), and the
    LATEST cohort must sit inside the ~50-slot driver window — green
    included, since the latest cohort is how upgraded oracles get their
    re-proof."""
    for rnd, cohort in JUDGE_PINS.items():
        unknown = cohort - set(REGISTRY)
        assert unknown == set(), f"round-{rnd} pins name unknown queries: {unknown}"
    window = set(list(REGISTRY)[:50])
    latest = JUDGE_PINS[max(JUDGE_PINS)]
    assert latest <= window
    # older cohorts: queries the driver has since checked have earned
    # their slot back; any still-unchecked member must be in the window
    _, checked, _ = _driver_records(_repo_root)
    for rnd, cohort in JUDGE_PINS.items():
        if rnd != max(JUDGE_PINS):
            assert cohort - checked <= window, f"round-{rnd} stragglers out of window"


def test_readme_registry_count_matches():
    """README's shop-window counts must track len(REGISTRY) — VERDICT r05
    item 6 (line 18 said 181 while the registry held 387)."""
    import re

    with open(f"{_repo_root}/README.md") as fh:
        text = fh.read()
    oracle_backed = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    m = re.search(r"registry: (\d+) named queries, (\d+) paired", text)
    assert m, "README layout line about the registry is missing"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(REGISTRY),
        oracle_backed,
    )
