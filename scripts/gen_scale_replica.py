#!/usr/bin/env python3
"""Generate a k× scale replica of a fixture dir for scale-sensitivity runs
(BASELINE.md "Scale sensitivity"). Dev-side tooling only (pyarrow), never
part of the engine.

Recipe (matches the round-1 replica at /tmp/graft_sf1):
  - fact tables are k id-offset copies (joins stay consistent: orders and
    lineitem share the o_orderkey offset); user_id is left alone so
    per-user densities are preserved
  - dimension tables (customer, nation, region, part, supplier) are copied
    verbatim
  - pyarrow concat preserves TIMESTAMP(NANOS) — DuckDB COPY would silently
    downcast to µs and break the ts-dependent queries (TESTDATA contract)

Axis modes (4th arg, default "row"):
  row  — the historical mode: fact ROWS multiply, user_id is preserved,
         so per-user densities grow k× but the user axis does not.
  user — additionally offsets events.user_id per copy, so the USER axis
         grows k× at constant per-user density. This is the replica the
         GlobalRank-family keys need: their ranked frame (users) is
         structurally flattered by the row mode (round-9 verdict task #3).
  docs — replicates ONLY documents + embeddings (doc_id/vec_id offsets),
         copying every other table verbatim. The oracle-at-scale harness
         uses this for >=10M-DOC runs (k=2000) where a full-fixture
         replica would drag 200M event rows nobody reads.

Usage: gen_scale_replica.py <srcDir> <dstDir> [k=10] [axis=row|user|docs]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os

FACT_OFFSETS = {           # table -> {id column: per-copy offset}
    "events":     {"event_id": 1_000_000},
    "orders":     {"o_orderkey": 10_000_000},
    "lineitem":   {"l_orderkey": 10_000_000},
    "documents":  {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}
DIMS = ["customer", "nation", "region", "part", "supplier"]

def replicate(src, dst, name, offsets, k):
    t = pq.read_table(f"{src}/{name}.parquet")
    copies = []
    for i in range(k):
        c = t
        for col, off in offsets.items():
            idx = c.schema.get_field_index(col)
            c = c.set_column(idx, col, pc.add(c.column(col), i * off))
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")

USER_AXIS_OFFSETS = {"events": {"user_id": 1_000_000}}

def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    axis = sys.argv[4] if len(sys.argv) > 4 else "row"
    assert axis in ("row", "user", "docs"), f"unknown axis {axis}"
    os.makedirs(dst, exist_ok=True)
    doc_tables = ("documents", "embeddings")
    for name, offs in FACT_OFFSETS.items():
        if axis == "docs" and name not in doc_tables:
            t = pq.read_table(f"{src}/{name}.parquet")
            pq.write_table(t, f"{dst}/{name}.parquet")
            print(f"{name}: {t.num_rows} (docs axis, copied)")
            continue
        if axis == "user" and name in USER_AXIS_OFFSETS:
            offs = {**offs, **USER_AXIS_OFFSETS[name]}
        replicate(src, dst, name, offs, k)
    for name in DIMS:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} (dim, copied)")

if __name__ == "__main__":
    main()
