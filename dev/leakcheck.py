#!/usr/bin/env python
"""Repo-owned leak scan with run provenance.

The round driver emits LEAKCHECK.json without a timestamp or a
scanned-file count, so a clean rerun is indistinguishable from a stale
relabel. This scanner covers the same threat classes with GENERIC
patterns (nothing proprietary is encoded here — encoding a private name
in the scanner would itself be a leak) and stamps the artifact with
when it ran and what it read.

Usage: python dev/leakcheck.py [outPath]   (default LEAKCHECK_LOCAL.json)
"""
import sys, os, re, json, glob, datetime

PATTERNS = {
    # cloud buckets / object stores that are not the public testdata dirs
    # (the literal host "bucket" / "c@a.dfs" are this repo's own synthetic
    # spec placeholders, not real endpoints)
    "bucket-uri": re.compile(
        r"\b(?:s3|s3a|gs|gcs|abfss?|wasbs?)://(?!bucket\b|c@a\b)[\w.-]+"),
    # AWS-style access key ids
    "api-key": re.compile(r"\bAKIA[0-9A-Z]{16}\b"),
    # slack webhooks / tokens
    "slack": re.compile(r"hooks\.slack\.com|\bxox[baprs]-[\w-]+"),
    # bearer/secret assignments with an inline literal
    "secret-literal": re.compile(
        r"(?i)\b(secret|token|passwd|password|api_key)\s*[:=]\s*['\"][^'\"]{8,}"),
    # URLs outside the apache/scala/github/arxiv public world ("site" is
    # the q49/q50 synthetic example.org URL prefix)
    "url": re.compile(r"https?://(?![\w.-]*(?:apache\.org|scala-lang\.org|"
                      r"github\.com|arxiv\.org|near\.org|nomicon|localhost|"
                      r"postgres|example\.com|duckdb\.org|w3\.org)|site\b)"
                      r"[\w.-]+"),
    # non-public JVM import roots: a reverse-domain import (com./io./…)
    # that is not the apache/test-framework world. Relative in-scope
    # imports (import TextFunctions._, import s.implicits._) are not
    # external roots and are ignored. Applied to .scala only.
    "import-root": re.compile(
        r"^\s*import\s+(?!org\.apache|org\.scalatest|org\.scalacheck"
        r"|com\.fasterxml\.jackson)"  # public; ships in /opt/spark/jars
        r"(?:com|io|net|ai|co|dev|org)\.[\w.]+", re.M),
}
SCALA_ONLY = {"import-root"}

ROOTS = ["src/**/*.scala", "dev/*.py", "*.md", "docs/*.md", "build.sbt",
         "project/*.sbt", "project/*.scala"]

def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_LOCAL.json"
    files = sorted({p for pat in ROOTS for p in glob.glob(pat, recursive=True)
                    if os.path.isfile(p)})
    hits = {k: [] for k in PATTERNS}
    for p in files:
        try:
            text = open(p, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for name, rx in PATTERNS.items():
            if name in SCALA_ONLY and not p.endswith(".scala"):
                continue
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{p}:{line}: {m.group(0)[:80]}")
    artifact = {
        "ran_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "scanned_files": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(artifact, open(out_path, "w"), indent=1)
    print(f"{out_path}: {len(files)} files scanned, "
          f"{artifact['n_hits']} hits")
    return 0 if artifact["n_hits"] == 0 else 1

if __name__ == "__main__":
    sys.exit(main())
