#!/usr/bin/env python3
"""Dev-only: per-query regression diff between two graft.Bench JSON lines.

Usage: benchdiff.py <old.json> <new.json> [threshold_pct]
Accepts either a raw Bench stdout line or a driver BENCH_r{N}.json wrapper
(reads the JSON line out of its "tail"). Exit 1 if any query slowed by more
than threshold_pct (default 50%) AND more than 0.5s absolute — the VM's
run-to-run noise is large, so small absolute deltas are not regressions.
"""
import json, re, sys


def load(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return doc["queries"]
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*?"queries":(\{[^}]*\}).*?\}', text)
    if not m:
        sys.exit(f"no bench JSON found in {path}")
    return json.loads(m.group(1))


def main(old_path, new_path, threshold_pct=50.0):
    old, new = load(old_path), load(new_path)
    regressions = []
    rows = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            rows.append((name, o, n, "added" if o is None else "REMOVED"))
            if n is None:  # a silently dropped query is a regression, not a win
                regressions.append(name)
            continue
        if n < 0:
            rows.append((name, o, n, "FAILED"))
            regressions.append(name)
            continue
        delta = n - o
        pct = 100.0 * delta / o if o > 0 else 0.0
        slow = pct > threshold_pct and delta > 0.5
        rows.append((name, o, n, f"{pct:+.0f}%" + (" REGRESSION" if slow else "")))
        if slow:
            regressions.append(name)
    for name, o, n, note in rows:
        os_ = f"{o:7.2f}" if isinstance(o, float) else "      -"
        ns_ = f"{n:7.2f}" if isinstance(n, float) else "      -"
        print(f"{name:28s} {os_} -> {ns_}  {note}")
    tot_o = sum(v for v in old.values() if v > 0)
    tot_n = sum(v for v in new.values() if v > 0)
    pct_s = f" ({100*(tot_n-tot_o)/tot_o:+.0f}%)" if tot_o > 0 else ""
    print(f"\ntotal {tot_o:.1f}s -> {tot_n:.1f}s{pct_s}")
    if regressions:
        print(f"REGRESSIONS: {', '.join(regressions)}")
        return 1
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
