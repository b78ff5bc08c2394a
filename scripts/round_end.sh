#!/usr/bin/env bash
# ROUND-END stamp — run this LAST each round, after the final content
# commit. Records the committed cudf_spark/queries tree SHA the driver is
# about to prove (ADVICE r09: direct evidence of what the driver ran,
# replacing commit-order heuristics in self_heal's soundness check), and
# commits the one-line stamp. The stamp file lives outside queries/, so
# committing it does not change the stamped tree.
set -e
cd "$(dirname "$0")/.."
python scripts/update_proven_hashes.py --stamp
git add scripts/queries_tree_sha.txt
git diff --cached --quiet || git commit -m "Stamp queries tree for the driver run"
echo "ROUND END: queries tree stamped"
