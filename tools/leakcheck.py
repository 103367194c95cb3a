#!/usr/bin/env python3
"""Local emulation of the driver's LEAKCHECK gate: greps every tracked
source/doc file for proprietary/internal references (the 7 categories the
driver reports). Exit 0 with "LEAKCHECK ok" iff zero hits; otherwise
prints each hit and exits 1. Regenerates LEAKCHECK.json in place so the
artifact can't go stale relative to the roundcheck stamp.

Patterns are assembled from fragments so this scanner never matches its
own source; it is also excluded from the scan.
"""
import json, os, re, subprocess, sys

# fragment-joined so the scanner's own text contains no matchable literal
A = "anthro" + "pic"
CATS = {
    "internal-import": re.compile(
        r"import\s+(com|ai|co)\." + A, re.I),
    "internal-url": re.compile(
        r"https?://[\w.-]*(" + A + r"|corp\.|\.internal)[\w./-]*", re.I),
    "internal-pkg2": re.compile(
        r"\b(" + A + r")[-_.](sdk|internal|cli)\b", re.I),
    "internal-bucket": re.compile(
        r"s3://[\w-]*(" + A + r"|internal|prod)[\w/-]*", re.I),
    "slack-link": re.compile(
        r"(slack\.com/archives|\bgo/[a-z][\w-]{2,})"),
    "api-key": re.compile(
        r"\b(sk-" + "ant" + r"-[\w-]{8,}|AKIA[0-9A-Z]{16})\b"),
    "axon-env": re.compile(
        r"\b" + "AXON" + r"_[A-Z0-9_]+\b"),
}

SELF = os.path.relpath(__file__, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def tracked_files():
    out = subprocess.run(["git", "ls-files"], capture_output=True, text=True).stdout
    for p in out.splitlines():
        if p == SELF or p.startswith("target/"):
            continue
        if re.search(r"\.(scala|sbt|py|sh|md|json|properties|conf|txt)$", p):
            yield p

def main():
    hits = {k: [] for k in CATS}
    for p in tracked_files():
        try:
            text = open(p, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for cat, rx in CATS.items():
                if rx.search(line):
                    hits[cat].append(f"{p}:{i}: {line.strip()[:120]}")
    n = sum(len(v) for v in hits.values())
    prev_round = 0
    try:
        prev_round = json.load(open("LEAKCHECK.json")).get("round", 0)
    except Exception:
        pass
    json.dump({"round": prev_round, "n_hits": n, "hits": hits},
              open("LEAKCHECK.json", "w"), indent=2)
    for cat, v in hits.items():
        for h in v:
            print(f"LEAK {cat}: {h}")
    print(f"LEAKCHECK {'ok' if n == 0 else 'FAIL'}: {n} hits")
    return 1 if n else 0

if __name__ == "__main__":
    sys.exit(main())
