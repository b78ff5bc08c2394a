#!/usr/bin/env bash
# Registry-wide gates — run before EVERY commit that registers a query.
#
# Three invariants rot silently when only the new query's file is tested
# (it happened in rounds 3, 4 AND 5):
#   * test_output_contract — every registry query's output schema obeys
#     the driver-hash contract (no floats/arrays/maps, stable col names);
#   * test_scale_audit     — every registry query's physical plan passes
#     the 100 TB linter (or carries a justified KNOWN_BOUNDED entry);
#   * test_rotation        — the check-window rotation and README counts
#     still track the registry and the driver's CORRECTNESS records.
#
# The exit code is pytest's own — NOT a pipe's. Piping pytest through
# `tail`/`grep` and reading $? reports the PIPE's status and has twice
# produced a false "green" claim in COVERAGE.md. This script exists so
# there is no reason to ever hand-compose that pipeline again.
set -o pipefail
cd "$(dirname "$0")/.."
# Stale-stamp guard (VERDICT r10 item 8): a round that ended WITHOUT
# round_end.sh leaves queries_tree_sha.txt pointing at an older tree;
# self_heal then refuses (safe) and the suite is red with no actionable
# message. Fail fast here with the fix spelled out. Mid-round pin edits
# do NOT trip this — their queries commits postdate the newest record.
python scripts/update_proven_hashes.py --check-stamp || exit 1
python -m pytest tests/test_output_contract.py tests/test_scale_audit.py \
    tests/test_rotation.py -q "$@" | tail -25
status=${PIPESTATUS[0]}
echo "GATES EXIT: $status"
exit "$status"
