#!/usr/bin/env python3
"""Regenerate ClientPositiveReplaySpec's pinned file lists from a
zone-independent discovery report.

Usage: python3 tools/regen_pinned.py /tmp/qtest_report_tznone.txt

Reads PASS/PASS_DDL lines from a report produced with
QTEST_HARNESS_TZ=none (the suite JVM runs UTC, so only files whose
replay is independent of the JVM default zone can be pinned in CI),
drops the known-flaky exclusions, and rewrites the two `pinned*` Seqs
in src/test/scala/graft/ClientPositiveReplaySpec.scala in place.
"""
import re
import sys

# early-exit TRANSFORM races SIGPIPE under suite load (timing, not
# semantics — passes or fails run to run)
FLAKY = {"script_pipe"}

def fmt_seq(names, indent="    "):
    rows = []
    for i in range(0, len(names), 4):
        chunk = ", ".join(f'"{n}"' for n in names[i:i + 4])
        rows.append(indent + chunk)
    return ",\n".join(rows)

def main():
    report = sys.argv[1]
    ro, ddl = [], []
    for line in open(report, encoding="utf-8", errors="replace"):
        m = re.match(r"PASS(_DDL)? (\S+)\.q\.out ", line)
        if not m:
            continue
        name = m.group(2)
        if name in FLAKY:
            continue
        (ddl if m.group(1) else ro).append(name)
    ro.sort(); ddl.sort()

    spec = "src/test/scala/graft/ClientPositiveReplaySpec.scala"
    text = open(spec, encoding="utf-8").read()
    text = re.sub(
        r"(private val pinnedReadOnly: Seq\[String\] = Seq\(\n).*?(\n  \))",
        lambda m: m.group(1) + fmt_seq(ro) + m.group(2),
        text, flags=re.S)
    text = re.sub(
        r"(private val pinnedDdl: Seq\[String\] = Seq\(\n).*?(\n  \))",
        lambda m: m.group(1) + fmt_seq(ddl) + m.group(2),
        text, flags=re.S)
    open(spec, "w", encoding="utf-8").write(text)
    print(f"pinned: {len(ro)} read-only + {len(ddl)} ddl -> {spec}")

if __name__ == "__main__":
    main()
