"""Compare two bench.py artifacts per query.

Usage: python tools/compare_bench.py OLD.json NEW.json [threshold]

Reads the per-query map from each file (accepts either a raw bench
stdout capture — the largest JSON line wins — or a driver BENCH_r{N}
artifact whose "raw"/"parsed" fields wrap it), prints regressions
(new/old above threshold, default 1.25), improvements (below 1/t),
added and removed queries, and the headline delta. Exit code 1 when
any regression crosses the threshold, so BENCHLOG work can gate on it.
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> tuple[dict[str, float], float | None]:
    best: dict | None = None
    with open(path) as fh:
        text = fh.read()
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        for cand in (d, d.get("raw"), d.get("parsed")):
            if isinstance(cand, dict) and isinstance(cand.get("queries"), dict):
                if best is None or len(cand["queries"]) > len(best["queries"]):
                    best = cand
    if best is None:
        raise SystemExit(f"{path}: no bench JSON line with a queries map")
    return {k: float(v) for k, v in best["queries"].items()}, best.get("value")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, old_v = load_queries(sys.argv[1])
    new, new_v = load_queries(sys.argv[2])
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    shared = sorted(set(old) & set(new))
    regress = [
        (q, old[q], new[q]) for q in shared if old[q] > 0 and new[q] / old[q] > t
    ]
    improve = [
        (q, old[q], new[q]) for q in shared if new[q] > 0 and old[q] / new[q] > t
    ]
    print(f"headline: {old_v} -> {new_v} over {len(old)} -> {len(new)} queries")
    for title, rows in (("REGRESSIONS", regress), ("improvements", improve)):
        print(f"{title} (>{t}x, {len(rows)}):")
        for q, a, b in sorted(rows, key=lambda r: -(r[2] / r[1])):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    return 1 if regress else 0


if __name__ == "__main__":
    raise SystemExit(main())
