#!/usr/bin/env python
"""Maintain ``scripts/oracle_proven_hashes.json`` — the last DRIVER-PROVEN
sha256 of each query's oracle SQL.

VERDICT r07 item 8: an oracle rewrite whose only driver rows predate it
counts green under the rotation while the new oracle is unproven (the
r06 Lorenz red and the r07 13-query pin cohort were both this class).
The committed hash file plus tests/test_oracle_proof.py turn the "edit
an oracle → pin it the same round" rule into a mechanical invariant.

Run this ONCE at the start of each round, right after the driver commits
a new ``CORRECTNESS_r{N}.json`` and BEFORE editing any oracle: every
query hash-green in that newest record gets its current oracle hash
recorded (the driver ran the oracle exactly as committed at the end of
the previous round, so at round start current == proven). Entries for
unregistered names are dropped.

``--seed`` additionally records every ever-green oracle-backed query NOT
in the latest JUDGE_PINS cohort — used once in round 8 to bootstrap the
file (the judge's r6-vs-r7 ``oracles_dict()`` diff established that only
the 13 pinned queries' oracles changed since their last proof).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudf_spark.queries import (  # noqa: E402
    JUDGE_PINS,
    REGISTRY,
    _driver_records,
    _repo_root,
)

HASH_PATH = os.path.join(_repo_root, "scripts", "oracle_proven_hashes.json")

# Builder-stamped git tree SHA of cudf_spark/queries at the round's final
# commit — i.e. the exact tree the driver runs its oracles against (the
# driver starts immediately after the builder's last commit and never
# edits queries itself). ADVICE r09: the record's landing COMMIT is weak
# evidence of what the driver ran (an oracle edit bundled into, or
# committed just before, the record commit would pass); the stamp is
# direct evidence. Written by ``--stamp`` (see scripts/round_boundary.py
# round-end flow).
TREE_SHA_PATH = os.path.join(_repo_root, "scripts", "queries_tree_sha.txt")


def oracle_hash(sql: str) -> str:
    return hashlib.sha256(sql.encode("utf-8")).hexdigest()


def _git(*args: str) -> str | None:
    """Run git in the repo root; None on any failure (non-git checkout,
    missing binary) so callers degrade to 'not provable → do nothing'."""
    import subprocess

    try:
        proc = subprocess.run(
            ["git", *args], cwd=_repo_root, capture_output=True, text=True
        )
    except OSError:
        return None
    if proc.returncode != 0:
        return None
    return proc.stdout.strip()


def queries_tree_sha() -> str | None:
    """Tree SHA of cudf_spark/queries at HEAD (None outside a git repo)."""
    return _git("rev-parse", "HEAD:cudf_spark/queries")


def stamp_tree_sha() -> str | None:
    """Round-end step: record the committed queries tree the driver is
    about to run against. Requires a clean queries worktree (otherwise
    HEAD's tree is not what the driver will see)."""
    dirty = _git("status", "--porcelain", "cudf_spark/queries")
    if dirty is None or dirty:
        return None
    sha = queries_tree_sha()
    if sha:
        with open(TREE_SHA_PATH, "w") as fh:
            fh.write(sha + "\n")
    return sha


def apply_record(proven: dict[str, str], newest: dict[str, dict], registry) -> dict[str, str]:
    """Pure round-start step: every query hash-green in the newest driver
    record gets its CURRENT oracle hash stamped as proven (sound only when
    the current oracle text equals what the driver ran). Entries for
    unregistered names are dropped."""
    out = dict(proven)
    for name, row in newest.items():
        q = registry.get(name)
        if q is not None and q.oracle is not None and row.get("hash_match"):
            out[name] = oracle_hash(q.oracle)
    return {n: h for n, h in sorted(out.items()) if n in registry}


def _newest_record_path() -> str | None:
    records = sorted(glob.glob(os.path.join(_repo_root, "CORRECTNESS_r*.json")))
    return records[-1] if records else None


def queries_unchanged_since_record(record: str | None = None) -> bool:
    """True iff cudf_spark/queries is byte-identical to the tree the driver
    proved — the soundness condition for stamping CURRENT oracle hashes as
    driver-proven. Evidence, strongest first:

    1. Builder stamp (``TREE_SHA_PATH``): the queries tree SHA recorded at
       the round's final commit, which IS the tree the driver ran. Current
       HEAD tree must equal it (plus clean worktree). When a stamp exists
       it is authoritative — a mismatch refuses even if weaker evidence
       would pass (ADVICE r09 medium: commit-order heuristics can stamp an
       unproven oracle as proven).
    2. Tracked record, no stamp: no commits touching queries since the
       record landed, the landing commit itself didn't touch queries
       (bundled-edit case), and clean worktree.
    3. Untracked record (VERDICT r09 item 1 — the driver writes
       CORRECTNESS_r{N}.json WITHOUT committing it): the driver necessarily
       ran against the current worktree, so a clean queries worktree alone
       is the complete condition. ``git log -1`` on an untracked path
       returns empty; r8/r9's version treated that as "not provable" and
       left the suite red at exactly the state the judge tests.

    Any git failure (non-git checkout) → False: never heal on no evidence.
    """
    if record is None:
        record = _newest_record_path()
    if record is None:
        return False

    dirty = _git("status", "--porcelain", "cudf_spark/queries")
    if dirty is None or dirty:
        return False

    if os.path.exists(TREE_SHA_PATH):
        with open(TREE_SHA_PATH) as fh:
            stamped = fh.read().strip()
        current = queries_tree_sha()
        return bool(stamped) and current == stamped

    rel = os.path.relpath(record, _repo_root)
    commit = _git("log", "-1", "--format=%H", "--", rel)
    if commit is None:
        return False
    if not commit:
        # Untracked record: the driver ran against this (clean) worktree —
        # but only if no queries commit POSTDATES the record (ADVICE r10:
        # a queries commit landed after the driver wrote the untracked
        # record also leaves the worktree clean, and would stamp
        # never-proven oracles as proven). The record's mtime is the
        # driver's write time (untracked files keep their creation mtime);
        # require the newest queries-touching commit to predate it.
        last_q = _git("log", "-1", "--format=%ct", "--", "cudf_spark/queries")
        if last_q is None or not last_q:
            return False
        try:
            record_mtime = os.path.getmtime(record)
        except OSError:
            return False
        return int(last_q) <= record_mtime
    committed_same = _git("diff", "--name-only", commit, "HEAD", "--", "cudf_spark/queries")
    landing_touched = _git(
        "diff-tree", "--no-commit-id", "--name-only", "-r", commit, "--", "cudf_spark/queries"
    )
    return committed_same == "" and landing_touched == ""


def self_heal() -> bool:
    """Auto-run the round-start record step when (and only when) it is
    sound (queries tree unchanged since the newest record landed — see
    VERDICT r08 item 1: the driver commits CORRECTNESS after the builder's
    final commit, so a fresh round otherwise starts red). Returns True if
    the proven-hash file changed."""
    record = _newest_record_path()
    if record is None or not queries_unchanged_since_record():
        return False
    proven: dict[str, str] = {}
    if os.path.exists(HASH_PATH):
        with open(HASH_PATH) as fh:
            proven = json.load(fh)
    with open(record) as fh:
        newest = json.load(fh)
    healed = apply_record(proven, newest, REGISTRY)
    if healed == proven:
        return False
    with open(HASH_PATH, "w") as fh:
        json.dump(healed, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return True


def stale_stamp() -> bool:
    """True iff the builder stamp exists, mismatches HEAD's queries tree,
    and NO queries-touching commit postdates the newest driver record —
    i.e. a round ended without ``round_end.sh`` re-stamping (VERDICT r10
    item 8: the stamp is authoritative when present, so a stale one makes
    ``queries_unchanged_since_record`` refuse — safe but red — at the next
    round boundary). Mid-round pin edits are NOT stale: their queries
    commits postdate the record, and the stamp legitimately lags until
    round_end.sh runs as the round's last step."""
    if not os.path.exists(TREE_SHA_PATH):
        return False
    with open(TREE_SHA_PATH) as fh:
        stamped = fh.read().strip()
    current = queries_tree_sha()
    if current is None or current == stamped:
        return False
    record = _newest_record_path()
    if record is None:
        return True  # mismatched stamp and no record at all: re-stamp
    last_q = _git("log", "-1", "--format=%ct", "--", "cudf_spark/queries")
    if last_q is None or not last_q:
        return True
    rec_commit_ts = _git("log", "-1", "--format=%ct", "--", os.path.relpath(record, _repo_root))
    if rec_commit_ts:
        # Tracked record: its landing-commit time is the authority for when
        # the driver ran. File mtime is checkout-dependent — a fresh clone
        # resets it to checkout time, which postdates every commit and made
        # this gate flag the legitimate mid-round state (pinned queries
        # commits postdating the record) as stale.
        return int(last_q) <= int(rec_commit_ts)
    try:
        record_mtime = os.path.getmtime(record)
    except OSError:
        return True
    return int(last_q) <= record_mtime


def main(argv: list[str]) -> int:
    if "--check-stamp" in argv:
        if stale_stamp():
            print(
                "STALE STAMP: scripts/queries_tree_sha.txt does not match"
                " HEAD's cudf_spark/queries tree and no queries commit"
                " postdates the newest CORRECTNESS record — the previous"
                " round ended without re-stamping. Run scripts/round_end.sh"
                " (after verifying the queries tree is the one the driver"
                " proved)."
            )
            return 1
        print("stamp state ok")
        return 0
    if "--stamp" in argv:
        sha = stamp_tree_sha()
        if sha is None:
            print(
                "REFUSED: cudf_spark/queries worktree is dirty (or not a git"
                " repo) — commit all query edits, then stamp as the LAST"
                " round-end step."
            )
            return 1
        print(f"stamped queries tree {sha} -> {TREE_SHA_PATH}")
        return 0
    seed = "--seed" in argv
    # Run-order guard: stamping CURRENT oracle text as driver-proven is
    # only sound at round start, BEFORE any oracle edit. A dirty
    # queries/ tree means edits may already exist — refuse, so a
    # late/second run cannot silently record an unproven oracle as
    # proven and defeat tests/test_oracle_proof.py.
    import subprocess

    dirty = subprocess.run(
        ["git", "status", "--porcelain", "cudf_spark/queries"],
        cwd=_repo_root,
        capture_output=True,
        text=True,
    ).stdout.strip()
    if dirty and "--force" not in argv:
        print(
            "REFUSED: cudf_spark/queries has uncommitted changes — run this"
            " at round start before editing any oracle (override with"
            " --force only if you are certain no oracle text changed):\n"
            + dirty
        )
        return 1
    proven: dict[str, str] = {}
    if os.path.exists(HASH_PATH):
        with open(HASH_PATH) as fh:
            proven = json.load(fh)

    record = _newest_record_path()
    if record is not None:
        with open(record) as fh:
            newest = json.load(fh)
        proven = apply_record(proven, newest, REGISTRY)

    if seed:
        _, _, green = _driver_records(_repo_root)
        latest_pins = JUDGE_PINS[max(JUDGE_PINS)]
        for name in green - latest_pins:
            q = REGISTRY.get(name)
            if q is not None and q.oracle is not None and name not in proven:
                proven[name] = oracle_hash(q.oracle)

    proven = {n: h for n, h in sorted(proven.items()) if n in REGISTRY}
    with open(HASH_PATH, "w") as fh:
        json.dump(proven, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"recorded {len(proven)} proven oracle hashes -> {HASH_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
