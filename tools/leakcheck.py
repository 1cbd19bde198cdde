#!/usr/bin/env python3
"""Scan the repo's source for non-public references and write LEAKCHECK.json.

Usage: python3 tools/leakcheck.py [round_number]

Categories mirror the driver-side artifact: imports/URLs/package names/
bucket URIs that would indicate code referencing anything other than the
public Spark API, the public reference repo, or published material; plus
credential-shaped strings and suspicious env vars. The artifact records
the scan command and timestamp so a reader can tell a fresh scan from a
relabeled old one.
"""
import json, os, re, subprocess, sys, time

CATEGORIES = {
    # only ROOTED package imports count (com.foo.*, io.foo.*, ...);
    # relative imports (import spark.implicits._, import TestSession._)
    # are local Scala scoping, not dependencies
    "internal-import": r"^\s*import\s+(?!(org\.apache\.(spark|hadoop|avro|commons)\.|org\.(scalatest|scalacheck|xml|w3c)\b|com\.fasterxml\.|graft\.))(org|com|net|io|ai|dev|edu|gov|cloud|software|jakarta)\.[a-z]",
    "internal-url": r"https?://(?!(www\.)?(apache\.org|github\.com|spark\.apache\.org|duckdb\.org|arxiv\.org|dl\.acm\.org|doi\.org|example\.com|localhost|127\.0\.0\.1))[a-z0-9.-]+\.(corp|internal|intranet)\b",
    "internal-pkg2": r"\b(com|net|io)\.(?!fasterxml)[a-z]+\.(internal|proprietary)\b",
    "internal-bucket": r"\b(s3a?|gs|abfss?|hdfs)://(?![a-z0-9./_-]*(example|test|tmp|localhost))[a-z0-9._-]*(prod|corp|internal)[a-z0-9._-]*/",
    "slack-link": r"\b[a-z0-9-]+\.slack\.com\b|\bslack://",
    "api-key": r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,}|xox[baprs]-[A-Za-z0-9-]{10,})\b",
    "axon-env": r"\b[A-Z_]*(SECRET|TOKEN|APIKEY|API_KEY|PASSWD|PASSWORD)[A-Z_]*\s*=",
}

SCAN_DIRS = ["src", "tools", "build.sbt"]
EXT = (".scala", ".py", ".sbt", ".md", ".json", ".sql")


def files():
    for root in SCAN_DIRS:
        if os.path.isfile(root):
            yield root
            continue
        for d, _, fs in os.walk(root):
            for f in fs:
                if f.endswith(EXT):
                    yield os.path.join(d, f)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in CATEGORIES}
    pats = {k: re.compile(v) for k, v in CATEGORIES.items()}
    for path in files():
        try:
            lines = open(path, encoding="utf-8", errors="replace").read().splitlines()
        except OSError:
            continue
        for i, line in enumerate(lines, 1):
            for cat, pat in pats.items():
                if pat.search(line):
                    hits[cat].append(f"{path}:{i}: {line.strip()[:160]}")
    n = sum(len(v) for v in hits.values())
    out = {
        "round": rnd,
        "n_hits": n,
        "hits": hits,
        "scan": {
            "command": "python3 tools/leakcheck.py " + (sys.argv[1] if len(sys.argv) > 1 else ""),
            "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "git_head": subprocess.run(["git", "rev-parse", "HEAD"],
                                       capture_output=True, text=True).stdout.strip(),
            "files_scanned": sum(1 for _ in files()),
        },
    }
    with open("LEAKCHECK.json", "w") as f:
        json.dump(out, f, indent=2)
    print(f"leakcheck: {n} hits across {out['scan']['files_scanned']} files -> LEAKCHECK.json")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()
