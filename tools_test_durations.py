#!/usr/bin/env python3
"""Summarize a pytest junitxml report: per-module totals + slowest
individual tests. Usage: python tools_test_durations.py <report.xml>"""
import sys
import xml.etree.ElementTree as ET
from collections import defaultdict

tree = ET.parse(sys.argv[1])
by_mod = defaultdict(float)
tests = []
n = 0
for tc in tree.iter("testcase"):
    t = float(tc.get("time", 0))
    cls = tc.get("classname", "")
    mod = cls.split(".")[0] if cls else "?"
    by_mod[mod] += t
    tests.append((t, f"{cls}::{tc.get('name')}"))
    n += 1
print(f"total tests: {n}, total time: {sum(by_mod.values()):.1f}s")
print("\n-- per module --")
for m, t in sorted(by_mod.items(), key=lambda kv: -kv[1]):
    print(f"{t:8.1f}s  {m}")
print("\n-- slowest 60 tests --")
for t, name in sorted(tests, reverse=True)[:60]:
    print(f"{t:8.1f}s  {name}")
