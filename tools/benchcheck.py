#!/usr/bin/env python3
"""Gate on a bench output line: refuse a run whose drift comparison was
vacuous (baseline fingerprint mismatch) or that had failures.

Usage: benchcheck.py <bench-json-file-or-log>

Accepts either a bare JSON line or a log containing one; uses the LAST
{"metric":...} line found. Exit codes: 0 clean, 1 failures or drift,
2 vacuous comparison (fingerprint mismatch — re-pin PERF_BASELINE.json),
3 no bench line found.
"""
import json
import re
import sys


def main(path: str) -> int:
    line = None
    for ln in open(path, encoding="utf-8", errors="replace"):
        if '"metric"' in ln:
            m = re.search(r'\{"metric".*\}', ln)
            if m:
                line = m.group(0)
    if line is None:
        print(f"BENCHCHECK: no bench JSON line in {path}")
        return 3
    b = json.loads(line)
    rc = 0
    if not b.get("baseline_fingerprint_match", True):
        # an empty drift map here means NOTHING was compared — the one
        # state a human reader mistakes for "no drift"
        print("BENCHCHECK: VACUOUS — baseline fingerprint mismatch "
              f"(data {b.get('fingerprint')}); drift map was suppressed. "
              "Re-pin PERF_BASELINE.json on the current testdata.")
        return 2
    if b.get("failed"):
        print(f"BENCHCHECK: failures: {b['failed']}")
        rc = 1
    if b.get("drift"):
        print(f"BENCHCHECK: drift over 1.5x baseline: {b['drift']}")
        rc = 1
    if rc == 0:
        print(f"BENCHCHECK: ok — total {b.get('value'):.1f}s, "
              f"{len(b.get('queries', {}))} queries, no drift, fingerprint matched")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
