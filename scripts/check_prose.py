#!/usr/bin/env python
"""Mechanical prose-vs-artifact drift checker (VERDICT r4 item 4).

Quoted performance numbers in CLAUDE.md / docs/ARCHITECTURE.md must match
the LATEST committed driver bench artifact (highest-numbered BENCH_r*.json
at the repo root; a review artifact like BENCH_r03_review.json wins over
the same round's timed-out run).  The prose sync rule is: quote the latest
driver BENCH, mechanically — this script is the mechanism.  Run it before
every snapshot commit; it exits nonzero listing every drifted figure.

Each check is (file, regex with ONE float capture group, bench key,
relative tolerance).  A missing pattern is a failure too (prose must keep
quoting the number so drift stays detectable).
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def latest_bench() -> tuple[str, dict]:
    """BENCH_LOCAL.json (freshest full builder run, written by bench.py)
    wins when present; otherwise the highest driver round number, with
    `_review` beating the plain file for a round."""
    local = ROOT / "BENCH_LOCAL.json"
    if local.exists():
        data = json.loads(local.read_text())
        parsed = data.get("parsed", data)
        if isinstance(parsed, dict) and "value" in parsed:
            return local.name, parsed
    best: tuple[int, int, Path] | None = None
    for p in ROOT.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)(_review)?\.json$", p.name)
        if not m:
            continue
        key = (int(m.group(1)), 1 if m.group(2) else 0, p)
        if best is None or key[:2] > best[:2]:
            best = key
    if best is None:
        sys.exit("check_prose: no BENCH_r*.json artifact found")
    data = json.loads(best[2].read_text())
    parsed = data.get("parsed", data)  # driver wrapper vs raw bench line
    if not isinstance(parsed, dict) or "value" not in parsed:
        sys.exit(f"check_prose: {best[2].name} has no parsed bench line")
    return best[2].name, parsed


# (relative-path, regex with one float group, bench key, rel tolerance)
# Tolerances: accuracy figures are quoted to the artifact's own rounding
# (2%); timing figures wiggle with quoting precision (6%).
CHECKS = [
    ("CLAUDE.md", r"(?m)^EPE ≈ ([\d.]+)", "epe3d", 0.02),
    ("CLAUDE.md", r"dynamic ≈ ([\d.]+) /", "epe3d_dynamic", 0.05),
    ("CLAUDE.md", r"ACC3DS ≈ ([\d.]+)", "acc3ds", 0.02),
    ("CLAUDE.md", r"gap-4x dynamic ≈ ([\d.]+)", "epe3d_dynamic_gap4x", 0.05),
    ("CLAUDE.md", r"([\d.]+) pairs/s\n\(", "value", 0.06),
    ("CLAUDE.md", r"\(([\d.]+) s/pair: cluster", "sec_per_pair", 0.06),
    ("CLAUDE.md", r"cluster ([\d.]+) ms", "stage_cluster_ms", 0.06),
    ("CLAUDE.md", r"match ([\d.]+) ms", "stage_match_ms", 0.06),
    ("CLAUDE.md", r"extract ([\d.]+) ms", "stage_extract_ms", 0.06),
    ("CLAUDE.md", r"hdbscan clustering EPE ([\d.]+)", "hdbscan_epe3d", 0.05),
    ("CLAUDE.md", r"([\d.]+) s/pair \(voxel-dedup", "hdbscan_sec_per_pair", 0.06),
    ("docs/ARCHITECTURE.md", r"EPE3D ([\d.]+) / dynamic", "epe3d", 0.03),
    ("docs/ARCHITECTURE.md", r"EPE3D [\d.]+ / dynamic ([\d.]+)", "epe3d_dynamic", 0.05),
    ("docs/ARCHITECTURE.md", r"throughput: ([\d.]+) s per frame pair", "sec_per_pair", 0.06),
    ("docs/ARCHITECTURE.md", r"\(([\d.]+) pairs/s\)", "value", 0.06),
    ("docs/ARCHITECTURE.md", r"clustering ([\d.]+) ms", "stage_cluster_ms", 0.06),
    ("docs/ARCHITECTURE.md", r"matcher ([\d.]+) ms", "stage_match_ms", 0.06),
    ("docs/ARCHITECTURE.md", r"extract ([\d.]+) ms", "stage_extract_ms", 0.06),
    ("docs/ARCHITECTURE.md", r"dynamic EPE ([\d.]+) —\n", "epe3d_dynamic_gap4x", 0.05),
    ("README.md", r"EPE3D overall \| 0.0114 \| \*\*([\d.]+)\*\*", "epe3d", 0.03),
    ("README.md", r"EPE3D dynamic \| 0.1248 \| \*\*([\d.]+)\*\*", "epe3d_dynamic", 0.05),
    ("README.md", r"\| \*\*([\d.]+)\*\* \(constant cost\)", "epe3d_dynamic_gap4x", 0.05),
    ("README.md", r"\(([\d.]+) pairs/s\) on one v5e chip", "value", 0.06),
    ("README.md", r"([\d.]+) s / frame pair", "sec_per_pair", 0.06),
    ("README.md", r"([\d.]+) s/pair \(EPE", "hdbscan_sec_per_pair", 0.06),
]


def main() -> int:
    name, bench = latest_bench()
    failures = []
    for rel, pattern, key, tol in CHECKS:
        if key not in bench:
            failures.append(f"{rel}: bench key {key!r} absent from {name}")
            continue
        want = float(bench[key])
        text = (ROOT / rel).read_text()
        m = re.search(pattern, text)
        if not m:
            failures.append(f"{rel}: pattern {pattern!r} not found (key {key})")
            continue
        got = float(m.group(1))
        denom = max(abs(want), 1e-9)
        if abs(got - want) / denom > tol:
            failures.append(
                f"{rel}: quotes {got} for {key} but {name} says {want} "
                f"(rel err {abs(got - want) / denom:.1%} > {tol:.0%})")
    if failures:
        print(f"check_prose: {len(failures)} drift(s) vs {name}:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(f"check_prose: OK — {len(CHECKS)} quoted figures match {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
