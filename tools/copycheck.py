#!/usr/bin/env python3
"""Local emulation of the driver's COPYCHECK gate: line-similarity of
every repo source file against every file in /root/reference (the public
CDC tutorial). Flags any pair above the 0.6 ratio the driver uses and
regenerates COPYCHECK.json so the artifact can't go stale relative to
the roundcheck stamp. Exit 0 iff nothing is flagged.
"""
import difflib, json, os, subprocess, sys

THRESHOLD = 0.6
REF_DIR = "/root/reference"

def ref_files():
    for root, _, names in os.walk(REF_DIR):
        for n in names:
            p = os.path.join(root, n)
            try:
                yield p, open(p, encoding="utf-8", errors="replace").read().splitlines()
            except OSError:
                pass

def repo_files():
    out = subprocess.run(["git", "ls-files"], capture_output=True, text=True).stdout
    for p in out.splitlines():
        if p.endswith((".scala", ".sbt", ".py", ".sh")):
            yield p, open(p, encoding="utf-8", errors="replace").read().splitlines()

def main():
    refs = list(ref_files())
    flagged = []
    for rp, rlines in repo_files():
        for fp, flines in refs:
            if not rlines or not flines:
                continue
            ratio = difflib.SequenceMatcher(None, rlines, flines).ratio()
            if ratio > THRESHOLD:
                flagged.append({"repo": rp, "ref": fp, "ratio": round(ratio, 3)})
    json.dump({"threshold": THRESHOLD, "flagged": flagged},
              open("COPYCHECK.json", "w"), indent=2)
    for f in flagged:
        print(f"COPY {f['repo']} ~ {f['ref']} ({f['ratio']})")
    print(f"COPYCHECK {'ok' if not flagged else 'FAIL'}: {len(flagged)} flagged")
    return 1 if flagged else 0

if __name__ == "__main__":
    sys.exit(main())
