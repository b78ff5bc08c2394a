"""Rewrite fixture parquet files with bounded row groups (VERDICT r11 item 1).

Every sf0.01/sf0.1 fixture table was written as ONE parquet row group
(verified in the footers), so every scan stage is a single task at any
core count and the driver's 8-vs-32-core scaling ratio cannot separate
parallel from serial queries. This script rewrites the big tables with
``row_group_size = ceil(rows / TARGET_GROUPS)`` — a PURE LAYOUT change:

- values are byte-identical (pyarrow read_table -> write_table roundtrip,
  asserted with ``Table.equals`` including schema before the swap);
- schema + pandas/ARROW:schema key-value metadata are preserved (the
  installed pyarrow — 16.1.0 — is the exact version that created the
  fixtures, so the regenerated ARROW:schema blob is identical);
- compression (snappy) and format version (2.6) match the originals.

All 389 query result hashes must therefore be unchanged; the proof is a
full driver_sim + determinism sweep run AFTER the rewrite (recorded in
OPTIMIZATION_r12.md), not this assertion alone.

Originals are kept under ``/root/testdata_orig_r12/`` until the proof
lands; ``--restore`` puts them back.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil

import pyarrow.parquet as pq

TESTDATA = "/root/testdata"
BACKUP = "/root/testdata_orig_r12"
# Big tables only: the dims (nation 25 rows / region 5 rows / supplier
# 1k rows) stay single-group — splitting a 3 KB broadcast-side file buys
# nothing and TESTDATA.md's layout stays recognisable for them.
TABLES = ["lineitem", "orders", "events", "customer", "part", "documents", "embeddings"]
SFS = ["sf0.01", "sf0.1"]
TARGET_GROUPS = 32


def regen() -> None:
    for sf in SFS:
        os.makedirs(os.path.join(BACKUP, sf), exist_ok=True)
        for t in TABLES:
            path = os.path.join(TESTDATA, sf, f"{t}.parquet")
            bak = os.path.join(BACKUP, sf, f"{t}.parquet")
            tbl = pq.read_table(path)
            groups = min(TARGET_GROUPS, max(1, tbl.num_rows))
            rg_size = math.ceil(tbl.num_rows / groups)
            tmp = path + ".rg.tmp"
            pq.write_table(tbl, tmp, row_group_size=rg_size, compression="snappy")
            back = pq.read_table(tmp)
            assert back.equals(tbl, check_metadata=True), f"roundtrip mismatch: {sf}/{t}"
            meta = pq.ParquetFile(tmp).metadata
            if not os.path.exists(bak):
                shutil.copy2(path, bak)
            os.replace(tmp, path)
            print(f"{sf}/{t}: rows={tbl.num_rows} row_groups 1 -> {meta.num_row_groups}")


def restore() -> None:
    for sf in SFS:
        for t in TABLES:
            bak = os.path.join(BACKUP, sf, f"{t}.parquet")
            if os.path.exists(bak):
                shutil.copy2(bak, os.path.join(TESTDATA, sf, f"{t}.parquet"))
                print(f"restored {sf}/{t}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--restore", action="store_true")
    args = ap.parse_args()
    restore() if args.restore else regen()
