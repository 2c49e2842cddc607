"""README perf figures must trace to driver-captured bench records.

VERDICT r3 item 5: every number in README's driver-verified block is
generated from the newest parsed ``BENCH_r*.json``; this test re-renders the
block and fails when README drifts from that file (e.g. a hand-edited figure
or a new bench capture not yet propagated with
``tools/update_readme_perf.py``).
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_block_in_sync():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "update_readme_perf.py"),
         "--check"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_a_parsed_bench_record_exists():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from update_readme_perf import latest_bench
    finally:
        sys.path.pop(0)
    got = latest_bench()
    assert got is not None, "no BENCH_r*.json with parsed != null"
    name, parsed = got
    assert parsed.get("metric") == "hoi_2d_images_per_sec_per_chip"
