#!/usr/bin/env python3
"""Hub-flood fixture for the graph-family skew studies — the committed
form of the round-10 prose recipe (BASELINE.md): add a synthetic hub part
(partkey 999999) to every 10th order, so one node sits in 10% of ALL
orders at any scale — the power-law co-purchase shape the degree-oriented
graph keys are stressed on. Apply to a base dir or a k x replica (the
id-offset replication preserves l_orderkey % 10 residues, so the hub
share stays 10% at every scale).

Usage: gen_hub_fixture.py <srcDir> <dstDir>
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

HUB_PART = 999999
TABLES = ["customer", "nation", "region", "part", "supplier",
          "orders", "events", "documents", "embeddings"]


def main():
    src, dst = os.path.abspath(sys.argv[1]), sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(f"{src}/lineitem.parquet")
    ok = t.column("l_orderkey")
    tenth = pc.equal(pc.subtract(ok, pc.multiply(pc.divide(ok, 10), 10)), 0)
    flooded = t.filter(tenth)
    # one hub row per flooded ORDER: dedup the filtered rows on l_orderkey
    # (group-take-first), then rewrite l_partkey
    import pyarrow.dataset  # noqa: F401 (keeps pyarrow happy on older wheels)
    idx = flooded.group_by("l_orderkey").aggregate([("l_partkey", "min")])
    first = flooded.group_by("l_orderkey").aggregate(
        [(c, "min") for c in flooded.column_names if c != "l_orderkey"])
    first = first.rename_columns(
        ["l_orderkey"] + [c for c in flooded.column_names if c != "l_orderkey"])
    pk_i = first.schema.get_field_index("l_partkey")
    hub = first.set_column(
        pk_i, "l_partkey",
        pa.array([HUB_PART] * first.num_rows,
                 type=first.schema.field("l_partkey").type))
    hub = hub.select(t.column_names)
    out = pa.concat_tables([t, hub])
    pq.write_table(out, f"{dst}/lineitem.parquet")
    print(f"lineitem: {t.num_rows} + {hub.num_rows} hub rows "
          f"({100.0 * hub.num_rows / pc.count_distinct(ok).as_py():.1f}% of orders)")
    for name in TABLES:
        link = f"{dst}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{name}.parquet", link)
    print(f"other tables symlinked from {src}")


if __name__ == "__main__":
    main()
