#!/usr/bin/env python3
"""Gate on a bench output line: refuse a run whose drift comparison was
vacuous (baseline fingerprint mismatch) or that had failures.

Usage: benchcheck.py <bench-json-file-or-log>

Accepts either a bare JSON line or a log containing one; uses the LAST
{"metric":...} line found. Exit codes: 0 clean, 1 failures or drift,
2 vacuous comparison (fingerprint mismatch — re-pin PERF_BASELINE.json),
3 no bench line found, 4 usage error (no/unreadable argument),
5 baseline convention violation (PERF_BASELINE.json lacks the
`_convention` stamp — pins of unknown provenance can't gate; re-pin
with tools/pin_medians.py).
"""
import json
import os
import re
import sys

EXPECTED_CONVENTION = "six-run-median"


def check_baseline_convention() -> int:
    """The gate's pins must carry their provenance: a baseline without a
    `_convention` key mixes pinning regimes (the round-9 minima/median
    drift that cost two rounds of adjudication).
    """
    path = os.environ.get("SPARK_GRAFT_PERF_BASELINE",
                          os.path.join(os.path.dirname(__file__), "..",
                                       "PERF_BASELINE.json"))
    if not os.path.exists(path):
        return 0  # no baseline — bench already ran ungated
    try:
        b = json.load(open(path))
    except ValueError as e:
        print(f"BENCHCHECK: PERF_BASELINE.json unparseable: {e}")
        return 5
    conv = b.get("_convention")
    if conv != EXPECTED_CONVENTION:
        print(f"BENCHCHECK: PERF_BASELINE.json convention is {conv!r}, "
              f"expected {EXPECTED_CONVENTION!r} — re-pin with "
              "tools/pin_medians.py so every pin follows one convention")
        return 5
    return 0


def main(path: str) -> int:
    try:
        fh = open(path, encoding="utf-8", errors="replace")
    except OSError as e:
        print(f"BENCHCHECK: cannot read {path}: {e}")
        return 4
    line = None
    for ln in fh:
        if '"metric"' in ln:
            m = re.search(r'\{"metric".*\}', ln)
            if m:
                line = m.group(0)
    if line is None:
        print(f"BENCHCHECK: no bench JSON line in {path}")
        return 3
    b = json.loads(line)
    rc = check_baseline_convention()
    if rc:
        return rc
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
    hi = b.get("host_inflation")
    if b.get("canary_errored"):
        # a canary rep errored: start/end minima include time-to-failure
        # samples and host_inflation was nulled — say WHY, so a null
        # normalization is attributable instead of silent
        print("BENCHCHECK: warning — a canary rep errored; canary "
              "start/end figures are tainted and host_inflation is null "
              "for that reason")
    if b.get("drift"):
        # surface the weather-normalized ratios alongside the raw ones:
        # a drift entry whose normalized ratio falls back under 1.5x is
        # host weather (the canary moved with it), not a plan change
        if hi:
            norm = {k: round(v / hi, 2) for k, v in b["drift"].items()}
            print(f"BENCHCHECK: drift over 1.5x baseline: {b['drift']} "
                  f"(host_inflation {hi}; weather-normalized: {norm})")
        else:
            print(f"BENCHCHECK: drift over 1.5x baseline: {b['drift']}")
        rc = 1
    if rc == 0:
        hi_note = f", host_inflation {hi}" if hi is not None else ""
        print(f"BENCHCHECK: ok — total {b.get('value'):.1f}s, "
              f"{len(b.get('queries', {}))} queries, no drift, "
              f"fingerprint matched{hi_note}")
    return rc


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print("usage: benchcheck.py <bench-json-file-or-log>")
        sys.exit(4)
    sys.exit(main(sys.argv[1]))
