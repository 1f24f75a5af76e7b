#!/usr/bin/env python3
"""Fold a ProbeScaling10 fragment into docs/bench/scaling.json.

Usage: python3 tools/merge_scaling.py [/tmp/scaling_sf1.json]

Adds per-query keys (t1_r10, t10, exp10) to the existing rows; the
original t001/t01/t1/exp columns are left untouched (they are the r9
three-SF sweep; the decade extension re-measures its own sf0.1 endpoint
so exp10 is same-binary apples-to-apples).
"""
import json
import sys

frag_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_sf1.json"
scaling_path = "docs/bench/scaling.json"

with open(scaling_path) as f:
    scaling = json.load(f)
with open(frag_path) as f:
    frag = json.load(f)

for name, cols in frag["queries"].items():
    scaling["queries"].setdefault(name, {}).update(cols)

with open(scaling_path, "w") as f:
    json.dump(scaling, f, separators=(",", ":"))
print("merged", len(frag["queries"]), "queries into", scaling_path)
