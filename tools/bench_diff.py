"""Diff two BENCHDETAIL_r*.json median records (VERDICT r6 #2: r7-on
round comparisons must be median-vs-median).

Usage: python tools/bench_diff.py OLD.json NEW.json [top_n]

Prints a markdown table of the top_n slowest queries by OLD median with
their NEW medians and the ratio; queries missing on either side are
listed separately.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    with open(old_path) as f:
        old = json.load(f)["queries"]
    with open(new_path) as f:
        new = json.load(f)["queries"]
    rows = sorted(old.items(), key=lambda kv: -float(kv[1]))[:top_n]
    print(f"| query | {old_path.split('/')[-1]} median | "
          f"{new_path.split('/')[-1]} median | ratio |")
    print("|---|---|---|---|")
    for q, m_old in rows:
        m_new = new.get(q)
        if m_new is None:
            print(f"| {q} | {m_old} | (absent) | — |")
        elif m_old == 0:
            # sub-millisecond old median rounds to 0.0 — no finite ratio
            print(f"| {q} | {m_old} | {m_new} | — |")
        else:
            print(f"| {q} | {m_old} | {m_new} | {m_new / m_old:.2f}x |")
    added = sorted(set(new) - set(old))
    if added:
        print(f"\nnew queries ({len(added)}): " + ", ".join(added))


if __name__ == "__main__":
    main()
