#!/usr/bin/env python3
"""Pre-commit inventory guard (the round-9 failure mode: a query landed
in SparkEntry after the round-closing validation, leaving SURVEY.md one
row short and the suite red at HEAD). JVM-free twin of InventorySpec:
compares SURVEY.md §2.2 row ids against the query-name string literals
in SparkEntry.scala and against Oracle.scala's keys. Run before ANY
end-of-round snapshot; exit 0 = in sync.
"""
import re
import sys

def survey_ids():
    ids = set()
    for line in open("SURVEY.md"):
        m = re.match(r"^\| `([a-z0-9_]+)`", line)
        if m:
            ids.add(m.group(1))
    return ids

def entry_ids():
    src = open("src/main/scala/graft/SparkEntry.scala").read()
    # the queries map: "name" -> ((s, d) => ...)
    return set(re.findall(r'"([a-z0-9_]+)"\s*->\s*\(\(', src))

def oracle_ids():
    src = open("src/main/scala/graft/Oracle.scala").read()
    return set(re.findall(r'"([a-z0-9_]+)"\s*->', src))

# Queries deliberately shipped WITHOUT a DuckDB oracle twin (approx /
# sketch / RNG / codec results a row-hash can't pin; each is
# spec-verified instead — recounts, recall panels, golden bytes). Any
# NEW query landing here without being added to this list is drift:
# the correctness gate silently weakens to rows-only.
NO_ORACLE_OK = {
    "agg_approx_distinct", "agg_approx_percentile", "agg_count_min_sketch",
    "dedup_embed_cosine", "dedup_fuzzy_minhash",
    "dedup_simhash", "mm_decode_stub", "mm_image_phash", "mm_resize_stub",
    "sim_ann_ivf", "sim_ann_lsh", "sim_ann_pq",
    "text_compression_ratio", "text_fingerprint",
}

def main():
    survey, entry, oracle = survey_ids(), entry_ids(), oracle_ids()
    problems = []
    if survey - entry:
        problems.append(f"in SURVEY.md but not in SparkEntry.queries: {sorted(survey - entry)}")
    if entry - survey:
        problems.append(f"in SparkEntry.queries but missing a SURVEY.md row: {sorted(entry - survey)}")
    orphans = oracle - entry
    if orphans:
        problems.append(f"oracle SQL for undeclared queries: {sorted(orphans)}")
    unlisted = entry - oracle - NO_ORACLE_OK
    if unlisted:
        problems.append(
            f"declared queries with neither an oracle twin nor a NO_ORACLE_OK entry: {sorted(unlisted)}")
    stale = NO_ORACLE_OK - entry | NO_ORACLE_OK & oracle
    if stale:
        problems.append(f"NO_ORACLE_OK entries that are stale (gone or now oracled): {sorted(stale)}")
    if problems:
        print("INVENTORY DRIFT:")
        for p in problems:
            print(" -", p)
        sys.exit(1)
    print(f"inventory in sync: {len(entry)} queries, {len(oracle & entry)} oracle twins")

if __name__ == "__main__":
    main()
