"""benchkit: the bench harness's builders must be drivable off-chip.

The production-extract bench (VERDICT r4 item 5) is exercised here at tiny
shapes on CPU — the identical code path (fabricated reference-schema tree ->
``run_affordance_extraction`` -> product) that ``bench.py --section
extract_production`` times at the qual human-contact shape on the chip.
"""
from __future__ import annotations

import bench
from coma_tpu import benchkit


def test_extract_production_path_runs_tiny(tmp_path):
    rate, breakdown = benchkit.bench_extract_production(
        num_samples=6, workdir=str(tmp_path), h=40, o=16, n=24)
    assert rate > 0
    assert breakdown["num_samples"] == 6
    assert breakdown["products_saved"] == 1


def test_section_plan_names_resolve():
    assert set(n for n, _, _ in bench.SECTION_PLAN) <= set(bench.SECTION_FNS)
    # the headline measurement must run first: it alone determines `value`
    # (pipe_suite emits the exact-mode headline before everything else)
    assert bench.SECTION_PLAN[0][0] == "pipe_suite"


def test_parse_marks_merges_incremental_lines():
    """Sections emit one @@BENCH@@ line per sub-measurement; the orchestrator
    must merge them all (a budget kill keeps the already-measured prefix)."""
    out = "\n".join([
        "noise",
        bench.SECTION_MARK + '{"a": 1}',
        bench.SECTION_MARK + 'not json',
        bench.SECTION_MARK + '{"b": 2, "a": 3}',
    ])
    assert bench._parse_marks(out) == {"a": 3, "b": 2}
    assert bench._parse_marks("") == {}


def test_no_jit_closures_defined_in_bench_py():
    """bench.py is the hot-edit orchestrator; anything traced must live in
    benchkit (VERDICT r4 item 1 — cache-key discipline by construction)."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(bench))
    tree.body[0:1] = []  # drop the module docstring (it may NAME lax.scan)
    src = ast.unparse(tree)
    for needle in ("jax.jit", "generate_p", "lax.scan", ".lower("):
        assert needle not in src, f"traced code leaked into bench.py: {needle}"
