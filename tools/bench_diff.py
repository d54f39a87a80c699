#!/usr/bin/env python3
"""Per-query benchmark delta between two Bench JSON outputs.

Usage: python3 tools/bench_diff.py old.json new.json [threshold_pct]
Accepts either raw Bench output ({"metric":...,"queries":{...}}) or a
driver BENCH_r{N}.json wrapper (falls back to parsing its "tail").
Prints queries whose time changed more than threshold_pct (default 30)
plus totals; new/removed queries are listed separately.
"""
import json, re, signal, sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # play nice with | head


def normalize(d):
    """Accept the full Bench doc ({"value":…,"queries":…}), the legacy
    one-line compact form ({"total_s":…,"q":…}), and the r8 two-line
    form (aggregate {"total_s":…} with the per-query map in a sibling
    {"q":{…}} line, merged by load())."""
    if "q" in d and "queries" not in d:
        d = dict(d, queries=d["q"])
    if "total_s" in d and "value" not in d:
        d = dict(d, value=d["total_s"])
    return d


def load(path):
    d = json.load(open(path))
    if "queries" in d or "q" in d:
        return normalize(d)
    if d.get("parsed"):
        return normalize(d["parsed"])
    tail = d.get("tail", "")
    # r8 format: the last Bench line is a short aggregate
    # {"total_s":…,"failed":…,…} with the per-query map on the previous
    # {"q":{…}} line (possibly front-truncated — then skipped). NOT
    # anchored at end-of-tail: an sbt "[success] Total time…" epilogue
    # or any harness footer may trail the aggregate — take the LAST
    # occurrence wherever it sits.
    aggs = re.findall(r'\{"total_s":[^{}]*\}', tail)
    if aggs:
        merged = json.loads(aggs[-1])
        qline = re.search(r'\{"q":\{[^{}]*\}\}', tail)
        if qline:
            merged["q"] = json.loads(qline.group(0))["q"]
        return normalize(merged)
    # legacy one-line compact, then full-doc fallback
    for pat in (r'\{"total_s":.*?"q":\{[^{}]*\}\}', r'\{"metric":.*\}'):
        m = re.search(pat, tail)
        if m:
            return normalize(json.loads(m.group(0)))
    raise SystemExit(f"{path}: no bench JSON found")


def main(old_path, new_path, thresh=30.0):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    moved = []
    for k in common:
        a, b = oq[k], nq[k]
        if a <= 0 or b <= 0:
            moved.append((float("inf"), k, a, b))
            continue
        pct = (b - a) / a * 100
        if abs(pct) >= thresh:
            moved.append((pct, k, a, b))
    for pct, k, a, b in sorted(moved, key=lambda t: -abs(t[0])):
        tag = "FAIL" if a <= 0 or b <= 0 else f"{pct:+.0f}%"
        print(f"  {k}: {a:.2f}s -> {b:.2f}s  {tag}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print("new: " + ", ".join(f"{k} ({nq[k]:.2f}s)" for k in added))
    if removed:
        print("removed: " + ", ".join(removed))


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    main(sys.argv[1], sys.argv[2], t)
