#!/usr/bin/env python3
"""Context-probe analysis of a BENCH_FULL json: per-query GC ms, JIT
ms, and code-cache occupancy of the kept (min) round, joined with the
per-query seconds — the in-run-context adjudication tool (q274 watch).

Usage: bench_probes.py BENCH_FULL.json [query ...]
With no query names: prints the top rows by GC and by JIT, plus the
code-cache trajectory summary.
"""
import json
import sys


def main() -> None:
    d = json.load(open(sys.argv[1]))
    qs = d["queries"]
    probes = d.get("context_probes", {})
    names = sys.argv[2:]
    rows = [
        (k, qs.get(k), g, j, c)
        for k, (g, j, c) in probes.items()
    ]
    if names:
        for k in names:
            if k in probes:
                g, j, c = probes[k]
                print(f"{k}: {qs.get(k)} s, gc={g} ms, jit={j} ms, "
                      f"codecache={c/1e6:.0f} MB")
            else:
                print(f"{k}: no probe")
        return
    print("== top 12 by GC ms ==")
    for k, s, g, j, c in sorted(rows, key=lambda r: -r[2])[:12]:
        print(f"  {k}: {s} s, gc={g} ms, jit={j} ms")
    print("== top 12 by JIT ms ==")
    for k, s, g, j, c in sorted(rows, key=lambda r: -r[3])[:12]:
        print(f"  {k}: {s} s, gc={g} ms, jit={j} ms")
    ordered = [c for _, _, _, _, c in rows]
    if ordered:
        print(f"== code cache: first={ordered[0]/1e6:.0f} MB "
              f"last={ordered[-1]/1e6:.0f} MB "
              f"max={max(ordered)/1e6:.0f} MB ==")


if __name__ == "__main__":
    main()
