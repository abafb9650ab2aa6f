"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python scripts/check_bench_regression.py OLD.json NEW.json [threshold]

Reads the driver's BENCH_r{N}.json format ({"queries": {name: sec}} at
top level, or nested under a "tail"-style wrapper with the JSON on the
last line). Prints old/new/ratio per query, marks entries past the
threshold (default 1.5x), lists added/removed queries, and exits
non-zero if any shared query regressed past the threshold — so a
round's bench can gate in CI the way the oracle gate does.
"""

from __future__ import annotations

import json
import sys


def _inner_doc(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    # driver BENCH_r{N}.json: bench's JSON line is nested under "parsed"
    # (or the last line of "tail")
    if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
        return doc["parsed"]
    if "tail" in doc:
        line = doc["tail"].strip().splitlines()[-1]
        if "{" in line:
            inner = json.loads(line[line.index("{"):])
            if "queries" in inner:
                return inner
        # TRUNCATED artifact (the driver keeps only the tail of the
        # output, which can start mid-JSON — BENCH_r04.json does):
        # recover the per-query floats by regex; the one query whose
        # name the cut bisected is dropped.
        import re

        pairs = {
            k: float(v)
            for k, v in re.findall(r'"([A-Za-z0-9_]+)": ([0-9.]+)', line)
            if k not in ("value", "sf", "cpus", "load1_start",
                         "load5_start", "load1_end", "load5_end")
        }
        if pairs:
            print(f"NOTE: {path} tail is truncated mid-JSON; recovered "
                  f"{len(pairs)} per-query entries by regex")
            return {"queries": pairs}
    raise SystemExit(f"{path}: no 'queries' key")


def load_queries(path: str) -> dict[str, float]:
    return _inner_doc(path)["queries"]


def check_load(path: str) -> None:
    """Refuse the comparison when the run started on a loaded host
    (VERDICT r4 #4): a start load1 above cores/4 inflated r4's
    untouched tier 1.15x and poisons every cross-round ratio. Bench
    runs predating the load field pass with a warning — their load is
    unknown, not known-bad."""
    doc = _inner_doc(path)
    meta = doc.get("load")
    if not isinstance(meta, dict):
        print(f"NOTE: {path} has no load metadata (pre-r5 run); "
              "cannot verify it ran on a quiet host")
        return
    cpus = meta.get("cpus") or 1
    load1 = meta.get("load1_start")
    if load1 is not None and load1 > cpus / 4:
        raise SystemExit(
            f"{path}: started at load1={load1} on {cpus} cpus "
            f"(> cores/4 = {cpus / 4:.1f}) — rerun on a quiet host; "
            "contention-poisoned ratios are not comparable"
        )


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    check_load(sys.argv[1])
    check_load(sys.argv[2])
    old = load_queries(sys.argv[1])
    new = load_queries(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(old) & set(new))
    regressed = []
    print(f"{'query':42s} {'old':>7s} {'new':>7s} ratio")
    for q in shared:
        ratio = new[q] / old[q] if old[q] else float("inf")
        flag = ""
        if ratio > threshold:
            flag = f"  <-- REGRESSION (> {threshold}x)"
            regressed.append(q)
        print(f"{q:42s} {old[q]:7.3f} {new[q]:7.3f} {ratio:5.2f}{flag}")
    for q in sorted(set(new) - set(old)):
        print(f"{q:42s} {'new':>7s} {new[q]:7.3f}")
    for q in sorted(set(old) - set(new)):
        print(f"{q:42s} {old[q]:7.3f} {'gone':>7s}")
    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    print(f"\nshared-query total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x), {len(regressed)} regressed")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
