#!/usr/bin/env python3
"""Dimension-axis replica (round-11 verdict task #7): widen the embedding
column from the fixture's d=64 to a target d (e.g. 512 — the 384-1024 range
real pipelines embed at) WITHOUT changing the corpus geometry, so the
embedding-family keys answer the same queries while paying the real
per-dimension compute.

Widening = tile the source vector k = d/64 times with a per-tile sign flip
(+1 for even tiles, -1 for odd). That map is a scaled orthogonal-ish
transform applied identically to every row: dot(T(x), T(y)) = k*dot(x, y)
and |T(x)| = sqrt(k)*|x|, so COSINE similarity (and hence near-dup
structure, LSH recall targets, kNN neighbors) is preserved EXACTLY while
every dot product, LSH projection, PQ distance, and Gram update costs k*
the flops — the pure dimension axis, no confound from changed answers.

Other tables are symlinked. Usage: gen_dim_replica.py <src> <dst> [d=512]
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["customer", "nation", "region", "part", "supplier",
          "orders", "lineitem", "events", "documents"]


def main():
    src, dst = os.path.abspath(sys.argv[1]), sys.argv[2]
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(f"{src}/embeddings.parquet")
    emb = t.column("embedding").combine_chunks()
    n = len(emb)
    src_d = len(emb[0])
    assert d % src_d == 0, f"target d={d} must be a multiple of source d={src_d}"
    k = d // src_d
    flat = np.asarray(emb.values, dtype=np.float32).reshape(n, src_d)
    signs = np.array([1.0 if i % 2 == 0 else -1.0 for i in range(k)],
                     dtype=np.float32)
    wide = (flat[:, None, :] * signs[None, :, None]).reshape(n, d)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(wide.reshape(-1), type=pa.float32()), d).cast(
        pa.list_(pa.float32()))
    idx = t.schema.get_field_index("embedding")
    out = t.set_column(idx, "embedding", arr)
    pq.write_table(out, f"{dst}/embeddings.parquet")
    print(f"embeddings: {n} rows widened d={src_d} -> {d}")
    for name in TABLES:
        link = f"{dst}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{name}.parquet", link)
    print(f"other tables symlinked from {src}")


if __name__ == "__main__":
    main()
