#!/usr/bin/env python3
"""Head-domain flood fixture for the URL/domain-family scale studies
(round-11 verdict tasks #1/#3). Dev-side tooling only (pyarrow).

The synthetic URL derives its canonical host from (source, doc_id % 50):
subdomain = Subdomains[(doc_id % 50) // 10], host = sub.source.example.com
(llm/Url.scala). Rewriting `source` to one constant for every doc with
doc_id % 50 < 10 therefore funnels EXACTLY the docs whose subdomain index
is 0 ("news") into ONE canonical host — news.hubsrc.example.com — holding
20% of the corpus at any scale, the Zipf-head shape balanced residue-cycled
hosts never produce. doc_id (and hence every other doc_id-derived residue)
is untouched, so the fixture stays oracle-checkable: the DuckDB mirrors
recompute the same URLs from the same columns.

Non-document tables are symlinked from the source dir (saves space; the
domain family only reads documents).

Usage: gen_flood_fixture.py <srcDir> <dstDir>
"""
import sys
import os
import pyarrow.parquet as pq
import pyarrow.compute as pc

TABLES = ["customer", "nation", "region", "part", "supplier",
          "orders", "lineitem", "events", "embeddings"]


def main():
    src, dst = os.path.abspath(sys.argv[1]), sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(f"{src}/documents.parquet")
    doc_id = t.column("doc_id")
    residue = pc.subtract(doc_id, pc.multiply(pc.divide(doc_id, 50), 50))
    flood = pc.less(residue, 10)
    idx = t.schema.get_field_index("source")
    src_col = pc.if_else(flood, "hubsrc", t.column("source"))
    out = t.set_column(idx, "source", src_col)
    pq.write_table(out, f"{dst}/documents.parquet")
    n = out.num_rows
    nf = pc.sum(pc.cast(flood, "int64")).as_py()
    print(f"documents: {n} rows, {nf} ({100.0 * nf / n:.1f}%) -> one host")
    for name in TABLES:
        link = f"{dst}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{name}.parquet", link)
    print(f"other tables symlinked from {src}")


if __name__ == "__main__":
    main()
