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
    if problems:
        print("INVENTORY DRIFT:")
        for p in problems:
            print(" -", p)
        sys.exit(1)
    print(f"inventory in sync: {len(entry)} queries, {len(oracle & entry)} oracle twins")

if __name__ == "__main__":
    main()
