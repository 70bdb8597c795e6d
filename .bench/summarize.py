#!/usr/bin/env python3
import json, sys
a = json.load(open(sys.argv[1])); b = json.load(open(sys.argv[2]))
def sec(d):
    out = dict(d.get("queries", {}))
    for s in ("ssb", "extras", "tpcds"):
        out.update(d.get(s, {}))
    return out
qa, qb = sec(a), sec(b)
print(f"{'query':42s} {'before':>8s} {'after':>8s} {'ratio':>6s}")
tot_a = tot_b = 0.0
rows = []
for k in qa:
    if k in qb:
        tot_a += qa[k]; tot_b += qb[k]
        rows.append((qb[k]-qa[k], k))
rows.sort()
for d, k in rows[:12] + [(None, '---')] + rows[-12:]:
    if k == '---': print('  ...'); continue
    print(f"{k:42s} {qa[k]:8.3f} {qb[k]:8.3f} {qb[k]/max(qa[k],1e-9):6.2f}")
print(f"\nTOTAL {tot_a:.1f} -> {tot_b:.1f}  ({tot_b/tot_a:.3f}x)   loadavg {a.get('loadavg')} -> {b.get('loadavg')}")
for s in ("tpch_total","ssb_total","extras_total","tpcds_total","value"):
    print(f"  {s}: {a.get(s)} -> {b.get(s)}")
