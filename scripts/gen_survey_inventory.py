#!/usr/bin/env python3
"""Generate the SURVEY §2.10 key-inventory table mechanically.

One row per SparkEntry.queries key: key, family, module file, round landed.
 - keys + registration line: parsed from SparkEntry.scala
 - module: the graft.* module the lambda body calls (SparkEntry itself when
   the query is built inline)
 - round landed: first commit introducing the literal `"key" ->`, bucketed
   by the driver's `round N: verdict/...` boundary commits

Usage: python3 scripts/gen_survey_inventory.py > /tmp/inventory.md
"""
import re
import subprocess
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"

# driver end-of-round boundary commits (round -> commit); a key first seen
# at/before round N's boundary landed in round N
BOUNDARIES = [
    (1, "8e66496"), (2, "7338b0a"), (3, "1c90a3b"), (4, "ec284dc"),
    (5, "5204222"), (6, "e7bdc9f"), (7, "03857ee"), (8, "263c232"),
    (9, "1fe35a6"), (10, "dad1bfe"),
]


def commit_ts(ref):
    out = subprocess.run(["git", "log", "-1", "--format=%ct", ref],
                         capture_output=True, text=True, check=True)
    return int(out.stdout.strip())


def first_commit_ts(key):
    # -S finds commits changing the occurrence count of the literal
    out = subprocess.run(
        ["git", "log", "--all", "--reverse", "--format=%ct",
         "-S", f'"{key}" ->', "--", SRC],
        capture_output=True, text=True, check=True)
    lines = out.stdout.split()
    return int(lines[0]) if lines else None


FAMILIES = [
    (r"^(scan|filter_quality|repartition_fixed|explode_|encode_|project_pixel|hbase_key|sorted_sink|agg_count_by|agg_sum_by_pixel|agg_collect_)", "reference op"),
    (r"^(q1_agg|join_|window_|asof_|set_ops|agg_|events_window|json_|sessionize|merge_upsert|state_intervals|scd2|cdc_)", "relational"),
    (r"^dedup_", "dedup"),
    (r"^(line_|substring_|winnow_)", "dedup-granular"),
    (r"^(similarity_|knn_|embedding_|quantizer_|pq_|coreset_|semantic_|hard_negatives)", "ann/embedding"),
    (r"^(sparse_|bm25_|hybrid_|tfidf_)", "sparse retrieval"),
    (r"^(text_|lang_|doc_|quality_|corpus_|boilerplate|lm_score|pii_|decontaminate|vocab_|ngram_|pmi_|heavy_hitters|bpe_|readability_)", "text/quality"),
    (r"^(mix_|dsir_|rholoss_|sample_|curriculum_|export_|pack_|split_|corpus_split)", "selection/mixing/packing"),
    (r"^(multimodal_)", "multimodal"),
    (r"^(events_|stats_|eval_|state_)", "events/stats/eval"),
    (r"^(graph_)", "graph"),
    (r"^(sketch_|zonemap|zorder|hilbert|compaction|skew_|pyramid)", "sketch/layout"),
    (r"^oracle_canary$", "harness"),
    (r"^(k_anonymity|l_diversity|t_closeness|dq_report|dataset_card|er_|length_histogram|drift|source_classifier)", "governance/audit"),
]


def family(key):
    for pat, fam in FAMILIES:
        if re.search(pat, key):
            return fam
    return "other"


MODULE_RE = re.compile(r"graft\.((?:llm|ops|io|tiles|expr|streaming)\.[A-Z]\w+)")


def main():
    src = open(SRC).read()
    # registration sites: `"key" -> ((s, d) =>` in the queries map
    entries = []  # (key, start_offset)
    for m in re.finditer(
            r'"([a-z0-9_]+)" -> (?:\(\(s, [d_]\) =>|projectPixelQuery)', src):
        entries.append((m.group(1), m.start()))
    bounds = {r: commit_ts(c) for r, c in BOUNDARIES}

    rows = []
    for i, (key, off) in enumerate(entries):
        end = entries[i + 1][1] if i + 1 < len(entries) else off + 2000
        body = src[off:end]
        mods = sorted(set(MODULE_RE.findall(body)))
        module = mods[0].replace(".", "/") + ".scala" if mods else "SparkEntry.scala"
        ts = first_commit_ts(key)
        # no history yet / past the last boundary = landed this round
        rnd = 11
        if ts is not None:
            rnd = next((r for r, bt in sorted(bounds.items()) if ts <= bt), 11)
        rows.append((key, family(key), module, rnd))

    rows.sort(key=lambda r: r[0])
    print("| key | family | module | round |")
    print("|---|---|---|---|")
    for key, fam, module, rnd in rows:
        print(f"| `{key}` | {fam} | `{module}` | {rnd} |")
    print(f"\n{len(rows)} keys.", file=sys.stderr)


if __name__ == "__main__":
    main()
