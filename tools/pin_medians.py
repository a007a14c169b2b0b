#!/usr/bin/env python3
"""Re-pin PERF_BASELINE.json as per-query MEDIANS over a set of bench
logs (the round-9 pin convention, PERF.md "Pin convention change").

Usage: pin_medians.py <out.json> <bench-log-or-json>...

Every input may be a bare bench JSON line or a log containing one (the
LAST {"metric":...} line is used, same as benchcheck.py). Runs whose
fingerprint disagrees with the majority are REFUSED — medians across
regenerated testdata would be meaningless. Queries present in only some
runs (newly added headliners) pin to the median of the runs that have
them. The output carries `_fingerprint` and `_convention` so
benchcheck.py can validate that the gate's pins follow one convention.
"""
import json
import re
import statistics
import sys

CONVENTION = "six-run-median"


def bench_line(path: str) -> dict:
    txt = open(path, encoding="utf-8", errors="replace").read()
    line = None
    for m in re.finditer(r'\{"metric".*\}', txt):
        line = m.group(0)
    if line is None:
        # driver wrappers embed the (escaped) line inside a JSON "tail"
        try:
            doc = json.loads(txt)
        except ValueError:
            doc = None
        if isinstance(doc, dict):
            for m in re.finditer(r'\{"metric".*\}', str(doc.get("tail", ""))):
                line = m.group(0)
    if line is None:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(line)


def main(out: str, paths: list) -> int:
    runs = [bench_line(p) for p in paths]
    fps = [r.get("fingerprint") for r in runs]
    majority = max(set(fps), key=fps.count)
    kept = [r for r in runs if r.get("fingerprint") == majority]
    dropped = len(runs) - len(kept)
    if dropped:
        print(f"pin_medians: refusing {dropped} run(s) with a different "
              f"fingerprint than the majority ({majority})")
    if len(kept) < 3:
        raise SystemExit("pin_medians: need >= 3 fingerprint-consistent runs")
    queries = {}
    for r in kept:
        for q, v in r.get("queries", {}).items():
            queries.setdefault(q, []).append(float(v))
    pins = {q: round(statistics.median(vs), 3) for q, vs in sorted(queries.items())}
    doc = {"_fingerprint": majority, "_convention": CONVENTION,
           "_runs": len(kept)}
    doc.update(pins)
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"pin_medians: wrote {len(pins)} median pins over {len(kept)} runs "
          f"(fingerprint {majority}) to {out}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: pin_medians.py <out.json> <bench-log-or-json>...")
        sys.exit(4)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
