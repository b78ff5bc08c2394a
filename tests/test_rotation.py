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
        # red rows lead the window; every never-checked query sits
        # immediately after them, ahead of the whole green tail
        assert order[: len(red)] == sorted(red, key=list(REGISTRY).index)
        assert set(order[len(red) : len(red) + len(never)]) == set(never)
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
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(r03))

    order = _rotation_from_driver_records(str(tmp_path))
    assert order is not None and set(order) == set(REGISTRY)
    # the red row re-checks first; every never-checked query (the round-3
    # additions plus anything registered since) lands in the next slots,
    # ahead of every green query
    assert order[0] == "q17_small_quantity_revenue"
    _, checked, _ = _driver_records(str(tmp_path))
    never = {q for q in REGISTRY if q not in checked}
    assert ROUND3_NEW <= never
    assert never == set(order[1 : 1 + len(never)])
