#!/usr/bin/env python3
"""Dev harness mirroring the driver's correctness gate: read Verify's
parquet dumps + oracle_sql.json, run each oracle in DuckDB against the same
sf dir, and compare (columns sorted by name, values compared exactly)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"MISSING  {name} (no spark output)"); fails += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{pdir}/*.parquet"))])
    except Exception as e:
        print(f"READERR  {name}: {e}"); fails += 1; continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"SQLERR   {name}: {str(e)[:300]}"); fails += 1; continue
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    d = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(d.columns):
        print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}"); fails += 1; continue
    if len(s) != len(d):
        print(f"ROWS     {name}: spark={len(s)} duck={len(d)}"); fails += 1; continue
    ok = True
    for c in s.columns:
        a, b = s[c], d[c]
        try:
            # Dtype-strict gate (mirrors the driver's typed hash): a Spark
            # int64 vs an oracle float64 (e.g. DuckDB HUGEINT promotion from
            # uncast sum()-in-arithmetic) must FAIL here, not be absorbed by
            # the float coercion below. Compare dtype *kinds*, treating
            # pandas nullable ints (kind 'O' with int values / Int64) as 'i'.
            def kind(series):
                k = series.dtype.kind
                if str(series.dtype).startswith('Int'): return 'i'
                if k == 'O':
                    # object columns holding ints/Decimals (DuckDB HUGEINT /
                    # DECIMAL(38,0) — the repo's sanctioned big-int idiom)
                    # compare as integers, not as a dtype mismatch
                    import decimal
                    nn = series.dropna()
                    if len(nn) and all(isinstance(v, int) or
                                       (isinstance(v, decimal.Decimal) and
                                        v == v.to_integral_value())
                                       for v in nn.head(100)):
                        return 'i'
                return k
            ka, kb = kind(a), kind(b)
            num = {'i', 'u', 'f'}
            if ka != kb and (ka in num or kb in num) and not (ka in 'iu' and kb in 'iu'):
                print(f"DTYPE    {name}.{c}: spark={a.dtype} duck={b.dtype} "
                      f"(driver's typed hash would reject this — cast the oracle)")
                ok = False
                continue
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                av, bv = a.astype(float).values, b.astype(float).values
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            else:
                eq = (a.astype(object).where(pd.notnull(a), None).values ==
                      b.astype(object).where(pd.notnull(b), None).values)
            if not np.all(eq):
                bad = np.where(~eq)[0][:3]
                print(f"VALUE    {name}.{c}: {len(np.where(~eq)[0])} diffs, first rows {bad.tolist()}:")
                for i in bad:
                    print(f"   spark={a.iloc[i]!r}  duck={b.iloc[i]!r}")
                ok = False
        except Exception as e:
            print(f"CMPERR   {name}.{c}: {e}"); ok = False
    if ok: print(f"OK       {name} ({len(s)} rows)")
    else: fails += 1
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
