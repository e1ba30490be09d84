#!/usr/bin/env python3
"""Oracle-at-scale harness (round-11 verdict task #5): run a rotating
subset of SparkEntry keys through graft.Verify on a >=10M-row replica and
hash-compare against DuckDB exactly like the sf0.01 gate — producing a
committed ORACLE_SCALE_r{N}.json artifact instead of one-off prose.

Each invocation appends/updates entries in the output JSON:

  oracle_scale.py <fixtureDir> <outJson> <key1,key2> [ENV=VAL ...]

Entries record the fixture, any env overrides (e.g. the grouped-rank skew
gate forced low so the sub-bucketed path is the one being verified), the
spark row count, and the check.py verdict line.
"""
import sys, os, json, subprocess, re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    fdir, out_json, keys = sys.argv[1], sys.argv[2], sys.argv[3]
    env_over = dict(kv.split("=", 1) for kv in sys.argv[4:])
    work = f"/tmp/oracle_scale_{abs(hash((fdir, keys))) % 10**8}"
    subprocess.run(["rm", "-rf", work], check=True)
    env = {**os.environ, **env_over}
    r = subprocess.run(
        [f"{REPO}/scripts/run_main.sh", "graft.Verify", fdir, work, keys],
        env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        sys.exit(1)
    c = subprocess.run(
        ["python3", f"{REPO}/scripts/check.py", fdir, work, keys],
        capture_output=True, text=True)
    print(c.stdout)
    results = {}
    for line in c.stdout.splitlines():
        m = re.match(r"(OK|MISSING|READERR|SQLERR|SCHEMA|ROWS|DIFF|VALS)\s+(\S+)(.*)", line)
        if m:
            status, key, rest = m.groups()
            rows = re.search(r"\((\d+) rows\)", rest)
            results[key] = {
                "fixture": fdir,
                "env": env_over,
                "rows": int(rows.group(1)) if rows else None,
                "match": status == "OK",
                "detail": (status + rest.strip())[:200],
            }
    doc = {}
    if os.path.exists(out_json):
        doc = json.load(open(out_json))
    doc.update(results)
    json.dump(doc, open(out_json, "w"), indent=1, sort_keys=True)
    print(f"[oracle_scale] {out_json}: " +
          ", ".join(f"{k}={'OK' if v['match'] else 'FAIL'}" for k, v in results.items()))
    sys.exit(0 if all(v["match"] for v in results.values()) else 1)


if __name__ == "__main__":
    main()
