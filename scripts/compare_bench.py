#!/usr/bin/env python3
"""Compare two self-bench artifacts per query (min-vs-min).

Usage: compare_bench.py OLD.json NEW.json [topN]
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    qo, qn = old["queries_min"], new["queries_min"]
    common = sorted(set(qo) & set(qn))
    rows = [(k, qo[k], qn[k], qn[k] - qo[k]) for k in common
            if qo[k] > 0 and qn[k] > 0]
    rows.sort(key=lambda r: r[3])
    print(f"common={len(common)} old_total={sum(qo[k] for k in common):.1f}"
          f" new_total={sum(qn[k] for k in common):.1f}")
    ratios = sorted(qn[k] / qo[k] for k, o, n, d in rows)
    print(f"median ratio={ratios[len(ratios)//2]:.3f}")
    print("--- biggest improvements ---")
    for k, o, n, d in rows[:top]:
        print(f"{d:+7.2f}  {o:7.2f} -> {n:7.2f}  {k}")
    print("--- biggest regressions ---")
    for k, o, n, d in rows[-10:]:
        print(f"{d:+7.2f}  {o:7.2f} -> {n:7.2f}  {k}")


if __name__ == "__main__":
    main()
