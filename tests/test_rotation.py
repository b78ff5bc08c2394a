"""Check-window rotation: round 3 uses the hand-curated priority list;
from round 4 on (CORRECTNESS_r03.json present) the order derives from the
driver's own records — red rows first, never-checked next, green last."""

from __future__ import annotations

import json
import shutil

from cudf_spark.queries import (
    REGISTRY,
    _ROUND3_PRIORITY,
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
    # While only r01/r02 records exist the hand-curated round-3 window is
    # active; once the driver writes CORRECTNESS_r03.json the registry
    # switches to the dynamic rotation (red rows first, never-checked next).
    import os

    if os.path.exists(f"{_repo_root}/CORRECTNESS_r03.json"):
        order = _rotation_from_driver_records(_repo_root)
        assert order is not None and set(order) == set(REGISTRY)
        checked: set[str] = set()
        for i in range(1, 4):
            path = f"{_repo_root}/CORRECTNESS_r0{i}.json"
            if os.path.exists(path):
                with open(path) as fh:
                    checked.update(json.load(fh))
        never = [q for q in REGISTRY if q not in checked]
        # every never-checked query sits ahead of the green tail
        n_front = len([q for q in order if q in never])
        assert set(order[: len(never) + 4]).issuperset(never) or n_front == 0
    else:
        assert list(REGISTRY)[:50] == _ROUND3_PRIORITY
        assert _rotation_from_driver_records(_repo_root) is None


def test_round4_dynamic_rotation(tmp_path):
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
    checked = set(json.loads((tmp_path / "CORRECTNESS_r03.json").read_text()))
    for i in (1, 2):
        checked |= set(
            json.loads((tmp_path / f"CORRECTNESS_r0{i}.json").read_text())
        )
    never = {q for q in REGISTRY if q not in checked}
    assert ROUND3_NEW <= never
    assert never == set(order[1 : 1 + len(never)])
