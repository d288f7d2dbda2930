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
        old_doc = json.load(f)
    with open(new_path) as f:
        new_doc = json.load(f)
    old, new = old_doc["queries"], new_doc["queries"]
    # Like-for-like spreads (ADVICE r9): r09's artifact switched
    # query_spread_max_minus_min to outlier-TRIMMED while pre-r09
    # artifacts store raw max-min. Prefer the raw dict when both sides
    # have one; otherwise whatever each side recorded (the gate takes
    # max(old, new), so mixing definitions only ever loosens, and only
    # when one side predates r10).
    def _spreads(doc: dict) -> dict:
        return doc.get("query_spread_raw") or doc.get(
            "query_spread_max_minus_min", {}
        )

    old_spread = _spreads(old_doc)
    new_spread = _spreads(new_doc)
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

    # Real movers (VERDICT r8 #2c): a delta smaller than either record's
    # own trial spread for that query is host noise, not a plan change —
    # suppress it. Flag only |new-old| > max(spreads, 0.25s) AND ratio
    # outside [0.67, 1.5].
    movers = []
    for q in sorted(set(old) & set(new)):
        m_old, m_new = float(old[q]), float(new[q])
        gate = max(
            float(old_spread.get(q, 0.0)),
            float(new_spread.get(q, 0.0)),
            0.25,
        )
        if abs(m_new - m_old) <= gate or m_old == 0:
            continue
        ratio = m_new / m_old
        if ratio > 1.5 or ratio < 1 / 1.5:
            movers.append((ratio, q, m_old, m_new, gate))
    noisy = old_doc.get("host_noisy_at_start") or new_doc.get(
        "host_noisy_at_start"
    )
    print(f"\nreal movers (|Δ| > spread gate, ratio ±1.5x): {len(movers)}"
          + (" [CAUTION: a record is stamped host-noisy]" if noisy else ""))
    for ratio, q, m_old, m_new, gate in sorted(movers, key=lambda t: -t[0]):
        print(f"  {q}: {m_old} -> {m_new} ({ratio:.2f}x, gate {gate:.2f}s)")


if __name__ == "__main__":
    main()
