#!/usr/bin/env bash
# ROUND-START smoke — run this FIRST each round, before editing anything
# (VERDICT r09 item 8: round-boundary hygiene as one invocation).
#
#   1. self-heal the proven-oracle-hash file against the newest
#      CORRECTNESS record (sound whether the driver committed the record
#      or left it untracked — see scripts/update_proven_hashes.py);
#   2. registry gates (output contract, 100 TB scale audit, rotation);
#   3. driver_sim restricted to the latest JUDGE_PINS cohort — the
#      queries whose oracles changed last round and therefore carry the
#      highest staleness risk.
#
# Green here means the repo is in the exact state the judge tests at the
# round boundary. The counterpart scripts/round_end.sh stamps the queries
# tree as the LAST step of a round.
set -e
cd "$(dirname "$0")/.."
echo "== 1/3 proven-hash self-heal + full suite guard =="
python scripts/update_proven_hashes.py
python -m pytest tests/test_oracle_proof.py -q
echo "== 2/3 registry gates =="
bash scripts/gates.sh
echo "== 3/3 driver_sim on the latest JUDGE_PINS cohort =="
DRIVER_SIM_ONLY=@pins python scripts/driver_sim.py
# Optional stage 4 (VERDICT r10 item 1): randomized-fixture differential
# sweep. Off by default (the three stages above are the round-boundary
# contract); set FUZZ_SEEDS="1,2,3" to fuzz a rotating registry cohort
# per seed against seeded degenerate fixture trees.
if [ -n "${FUZZ_SEEDS:-}" ]; then
  echo "== 4/4 (optional) randomized-fixture differential sweep =="
  python scripts/fuzz_differential.py --seeds "$FUZZ_SEEDS"
fi
echo "ROUND START: all green"
