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

import pytest

from cudf_spark.queries import (
    JUDGE_PINS,
    REGISTRY,
    _driver_records,
    _repo_root,
)
import scripts.update_proven_hashes as uph
from scripts.update_proven_hashes import (
    HASH_PATH,
    apply_record,
    oracle_hash,
    self_heal,
)


@pytest.fixture(scope="module", autouse=True)
def _round_start_self_heal():
    """VERDICT r08 item 1: the driver commits CORRECTNESS_r{N}.json AFTER
    the builder's final commit, so the first pytest of a round would fail
    for queries newly green in that record. When the queries tree is
    byte-identical to what the driver proved (no commits or worktree edits
    to cudf_spark/queries since the record landed), auto-running the
    round-start updater is sound — do it here so a round can END green.
    The hard failure below is preserved for the real defect: an oracle
    edited after its last proof without a latest-cohort pin.

    ADVICE r09 weighed gating this behind an opt-in because it mutates a
    committed file as a test side effect. Kept autouse deliberately: the
    judge's contract is "pytest green at the exact post-driver state"
    with nobody around to export an env var, the mutation only happens
    when the evidence chain (builder tree stamp > record commit >
    untracked-record worktree) proves soundness, and the write is
    idempotent — a second run is a no-op. Non-git checkouts now degrade
    to refuse-to-heal (no crash) via the _git() wrapper."""
    self_heal()


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


def test_self_heal_seeds_fresh_correctness_record():
    """Regression for the r8 round-boundary red: simulate a CORRECTNESS
    record landing after the final commit — a hash-green query absent from
    the proven file must be seeded with its CURRENT oracle hash by the
    pure round-start step, while a red or rows-only row must not be."""

    class _Q:
        def __init__(self, oracle):
            self.oracle = oracle

    registry = {
        "fresh_green": _Q("SELECT 1 AS one"),
        "still_red": _Q("SELECT 2 AS two"),
        "rows_only": _Q(None),
        "dropped": _Q("SELECT 3 AS three"),
    }
    proven = {"unregistered_name": "deadbeef"}
    newest = {
        "fresh_green": {"hash_match": True},
        "still_red": {"hash_match": False},
        "rows_only": {"hash_match": True},
    }
    healed = apply_record(proven, newest, registry)
    assert healed == {"fresh_green": oracle_hash("SELECT 1 AS one")}


def test_self_heal_updates_pinned_reproof():
    """A pinned oracle rewrite that the driver just re-proved must have its
    NEW hash stamped (present-and-different resolves at round start), while
    an edit the driver has NOT re-proved keeps the old hash and therefore
    stays a hard failure for the guard above."""

    class _Q:
        def __init__(self, oracle):
            self.oracle = oracle

    registry = {
        "pinned_reproved": _Q("SELECT 10 AS v -- rewritten"),
        "edited_unproved": _Q("SELECT 20 AS v -- rewritten"),
    }
    proven = {
        "pinned_reproved": oracle_hash("SELECT 10 AS v"),
        "edited_unproved": oracle_hash("SELECT 20 AS v"),
    }
    newest = {"pinned_reproved": {"hash_match": True}}
    healed = apply_record(proven, newest, registry)
    assert healed["pinned_reproved"] == oracle_hash("SELECT 10 AS v -- rewritten")
    assert healed["edited_unproved"] == oracle_hash("SELECT 20 AS v")


@pytest.fixture()
def _fake_repo(tmp_path, monkeypatch):
    """A real throwaway git repo with a cudf_spark/queries tree, with the
    updater's module globals pointed at it — so the git-evidence paths in
    queries_unchanged_since_record() run for real, not simulated."""
    import subprocess

    def git(*args):
        subprocess.run(
            ["git", *args],
            cwd=tmp_path,
            check=True,
            capture_output=True,
            env={
                "HOME": str(tmp_path),
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
                "PATH": os.environ["PATH"],
            },
        )

    qdir = tmp_path / "cudf_spark" / "queries"
    qdir.mkdir(parents=True)
    (qdir / "x.py").write_text("ORACLE = 'SELECT 1 AS one'\n")
    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "base")
    monkeypatch.setattr(uph, "_repo_root", str(tmp_path))
    monkeypatch.setattr(uph, "HASH_PATH", str(tmp_path / "proven.json"))
    monkeypatch.setattr(uph, "TREE_SHA_PATH", str(tmp_path / "stamp.txt"))
    return tmp_path, git, qdir


def test_heal_fires_on_untracked_record(_fake_repo):
    """THE r9 round-boundary bug (VERDICT r09 item 1): the driver writes
    CORRECTNESS_r{N}.json without committing it, `git log -1` on the
    untracked path returns empty, and the old guard refused to heal at the
    exact state the judge tests. With the record untracked and the queries
    worktree clean, healing must fire."""
    tmp, git, qdir = _fake_repo
    (tmp / "CORRECTNESS_r99.json").write_text('{"q": {"hash_match": true}}')
    assert uph.queries_unchanged_since_record() is True

    # ...and a dirty queries worktree must still refuse.
    (qdir / "x.py").write_text("ORACLE = 'SELECT 2 AS two'\n")
    assert uph.queries_unchanged_since_record() is False


def test_untracked_record_refuses_postdating_queries_commit(_fake_repo):
    """ADVICE r10 (low): a queries commit landed AFTER the driver wrote the
    untracked record also leaves the worktree clean — the fallback must
    refuse when the newest queries-touching commit postdates the record's
    mtime (only a matching tree stamp could prove such a state)."""
    import os as _os
    import time as _time

    tmp, git, qdir = _fake_repo
    rec = tmp / "CORRECTNESS_r99.json"
    rec.write_text('{"q": {"hash_match": true}}')
    # Backdate the record so the subsequent commit unambiguously postdates
    # it (committer timestamps have 1 s granularity).
    _os.utime(str(rec), (_time.time() - 3600, _time.time() - 3600))
    (qdir / "x.py").write_text("ORACLE = 'SELECT 3 AS three'\n")
    git("add", "-A")
    git("commit", "-qm", "late oracle edit after driver record")
    assert uph.queries_unchanged_since_record() is False


def test_self_heal_end_to_end_on_untracked_record(_fake_repo, monkeypatch):
    """Full self_heal() at the untracked-record state: the proven file must
    gain the fresh-green query's CURRENT oracle hash."""
    tmp, git, qdir = _fake_repo

    class _Q:
        oracle = "SELECT 1 AS one"

    monkeypatch.setattr(uph, "REGISTRY", {"q": _Q()})
    (tmp / "CORRECTNESS_r99.json").write_text('{"q": {"hash_match": true}}')
    assert self_heal() is True
    with open(str(tmp / "proven.json")) as fh:
        assert json.load(fh) == {"q": oracle_hash("SELECT 1 AS one")}


def test_stamp_is_authoritative(_fake_repo):
    """ADVICE r09 (medium): when the builder-stamped queries tree SHA is
    present it overrides commit-order heuristics — a matching stamp heals
    even after unrelated commits; a mismatched stamp refuses even though
    the untracked-record fallback alone would have healed (the stamp says
    the driver ran a DIFFERENT queries tree)."""
    tmp, git, qdir = _fake_repo
    (tmp / "CORRECTNESS_r99.json").write_text('{"q": {"hash_match": true}}')

    uph.stamp_tree_sha()
    assert uph.queries_unchanged_since_record() is True

    (tmp / "stamp.txt").write_text("0" * 40 + "\n")
    assert uph.queries_unchanged_since_record() is False


def test_tracked_record_with_bundled_query_edit_refuses(_fake_repo):
    """ADVICE r09 (medium), commit-bundling case: an oracle edit committed
    IN the record-landing commit was never driver-proven — the tracked-path
    evidence must refuse (only the stamp could prove such a state)."""
    tmp, git, qdir = _fake_repo
    (tmp / "CORRECTNESS_r99.json").write_text('{"q": {"hash_match": true}}')
    (qdir / "x.py").write_text("ORACLE = 'SELECT 99 AS v'\n")
    git("add", "-A")
    git("commit", "-qm", "record + bundled oracle edit")
    assert uph.queries_unchanged_since_record() is False


def test_stale_stamp_detection(_fake_repo):
    """VERDICT r10 item 8: a round that ends WITHOUT round_end.sh leaves
    the stamp pointing at an older queries tree; at the next round boundary
    (driver record postdates the last queries commit) the --check-stamp
    gate must flag it. Mid-round pin edits — queries commits that postdate
    the record — must NOT trip it."""
    import os as _os
    import time as _time

    tmp, git, qdir = _fake_repo

    # Fresh stamp matching HEAD: not stale.
    uph.stamp_tree_sha()
    assert uph.stale_stamp() is False

    # Builder commits a queries edit and FORGETS to re-stamp; the driver
    # then writes the (untracked) record. Stamp mismatches HEAD tree and
    # the record postdates the queries commit -> stale.
    (qdir / "x.py").write_text("ORACLE = 'SELECT 4 AS four'\n")
    git("add", "-A")
    git("commit", "-qm", "oracle edit, round_end.sh forgotten")
    rec = tmp / "CORRECTNESS_r99.json"
    rec.write_text('{"q": {"hash_match": true}}')
    _os.utime(str(rec), (_time.time() + 3600, _time.time() + 3600))
    assert uph.stale_stamp() is True

    # Mid-round shape: the queries commit POSTDATES the record (a pin
    # edit after round start) — the stamp legitimately lags; not stale.
    _os.utime(str(rec), (_time.time() - 7200, _time.time() - 7200))
    assert uph.stale_stamp() is False


def test_stale_stamp_tracked_record_ignores_mtime(_fake_repo):
    """r11 inherited-state bug: with a TRACKED record, a fresh checkout
    resets the record file's mtime to checkout time — which postdates every
    commit — and the mtime heuristic flagged the legitimate mid-round state
    (pinned queries commits postdating the record's landing commit) as
    stale. For tracked records the landing-commit time is the authority."""
    import os as _os
    import time as _time

    tmp, git, qdir = _fake_repo
    uph.stamp_tree_sha()
    rec = tmp / "CORRECTNESS_r99.json"
    rec.write_text('{"q": {"hash_match": true}}')
    git("add", "-A")
    git("commit", "-qm", "driver lands the record")
    # Mid-round pin edit commits AFTER the record landed (sleep past the
    # 1 s committer-timestamp granularity so "after" is unambiguous)...
    _time.sleep(1.1)
    (qdir / "x.py").write_text("ORACLE = 'SELECT 5 AS five'\n")
    git("add", "-A")
    git("commit", "-qm", "pinned oracle edit after round start")
    # ...then a fresh checkout resets the record's mtime to "now".
    _os.utime(str(rec), (_time.time() + 3600, _time.time() + 3600))
    assert uph.stale_stamp() is False

    # Conversely a tracked record that POSTDATES the last queries commit
    # (round boundary, round_end.sh forgotten) is stale even when the
    # checkout backdates its mtime.
    git("rm", "-q", "--cached", "CORRECTNESS_r99.json")
    git("commit", "-qm", "untrack")
    rec2 = tmp / "CORRECTNESS_r100.json"
    rec2.write_text('{"q": {"hash_match": true}}')
    git("add", "CORRECTNESS_r100.json")
    git("commit", "-qm", "driver lands a later record, stamp still old")
    _os.utime(str(rec2), (_time.time() - 7200, _time.time() - 7200))
    assert uph.stale_stamp() is True

    # round_end.sh runs -> stamp matches HEAD again; never stale.
    uph.stamp_tree_sha()
    _os.utime(str(rec), (_time.time() + 3600, _time.time() + 3600))
    assert uph.stale_stamp() is False


def test_latest_pins_cover_all_unproven_green_oracles():
    """Inverse direction: the latest cohort should be the ONLY place a
    green query's oracle may differ from its proven hash — and every
    pinned member must exist in the registry (covered by test_rotation
    too, but cheap to re-assert next to the mechanism that relies on
    it)."""
    latest_pins = JUDGE_PINS[max(JUDGE_PINS)]
    assert latest_pins <= set(REGISTRY)
