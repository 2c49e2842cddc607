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


def _emit_json(bench_mod, extras, sections, capsys):
    bench_mod._emitted = False
    bench_mod._emit(extras, sections)
    import json

    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_floor_caches_give_every_metric_a_floor(capsys):
    """A degraded-tunnel round (live TPU sections produce nothing) must still
    record every metric from the committed floor caches, labeled _cached,
    with the headline falling back WITH an explicit [CACHED ...] annotation
    (round-5 resilience: the axon tunnel was observed stalling a trivial
    ones.sum() for 800+ s, which zeroed a full rehearsal)."""
    extras, sections = {}, {}
    for label, path in bench.FLOOR_CACHES:
        bench._load_floor_cache(label, path, extras, sections)
    # the committed caches must cover the full VERDICT metric set
    for key in (
        "hoi_2d_images_per_sec_cached",
        "unet_cfg_step_ms_cached",
        "unet_step_mfu_cached",
        "hoi_2d_images_per_sec_pointrend_loop_cached",
        "hoi_2d_images_per_sec_pointrend_loop_fast_cached",
        "hoi_2d_images_per_sec_fast_mode_cached",
        "hoi_2d_images_per_sec_crop_mode_cached",
        "coma_contact_aggregation_samples_per_sec_cached",
        "coma_object_contact_samples_per_sec_cached",
        "coma_quant_full_samples_per_sec_cached",
        "coma_occupancy_aggregation_samples_per_sec_cached",
        "flagship_dp_virtual_scaling_cached",
    ):
        assert key in extras, f"floor cache missing {key}"
    assert sections["pipe_cached"]["status"] == "cached"

    out = _emit_json(bench, dict(extras), dict(sections), capsys)
    assert out["value"] == extras["hoi_2d_images_per_sec_cached"]
    assert "[CACHED" in out["unit"]
    # derived-from-cached figures are flagged
    assert "coma_vs_torch_cpu_source" not in out["extra"]  # no torch base set


def test_live_results_take_precedence_over_floor(capsys):
    extras, sections = {}, {}
    for label, path in bench.FLOOR_CACHES:
        bench._load_floor_cache(label, path, extras, sections)
    extras["hoi_2d_images_per_sec"] = 0.9999
    extras["coma_contact_aggregation_samples_per_sec"] = 123.0
    extras["coma_torch_cpu_samples_per_sec"] = 1.0
    out = _emit_json(bench, extras, sections, capsys)
    assert out["value"] == 0.9999
    assert "[CACHED" not in out["unit"]
    assert out["extra"]["coma_vs_torch_cpu"] == 123.0
    assert "coma_vs_torch_cpu_source" not in out["extra"]


def test_tpu_section_cap_reserves_pending_cpu_sections():
    """pipe_suite stalling on a degraded tunnel must not starve dp_scaling —
    the one section a degraded round can always capture fresh."""
    plan = {n: i for i, (n, _, _) in enumerate(bench.SECTION_PLAN)}
    dp_min = next(mn for n, _, mn in bench.SECTION_PLAN if n == "dp_scaling")
    # pipe_suite runs first with dp_scaling pending: its window shrinks
    cap = bench._tpu_section_cap(plan["pipe_suite"], 1400.0, 300, {})
    assert cap == 1400.0 - dp_min
    # once dp_scaling has run, later TPU sections get the full remainder
    cap = bench._tpu_section_cap(
        plan["extract_production"], 400.0, 120,
        {"dp_scaling": {"status": "ok"}})
    assert cap == 400.0
    # the reserve never squeezes a section below its own min_needed
    cap = bench._tpu_section_cap(plan["pipe_suite"], 310.0, 300, {})
    assert cap == 300


def test_readme_merge_never_promotes_cached_floor():
    """A BENCH record whose headline fell back to the floor must not displace
    a genuinely captured figure in the README table."""
    import sys

    sys.path.insert(0, "tools")
    try:
        from update_readme_perf import merge_records
    finally:
        sys.path.pop(0)

    real = ("BENCH_r04.json", {
        "metric": "hoi_2d_images_per_sec_per_chip", "value": 0.6557,
        "vs_baseline": 1143.11,
        "unit": "img/s/chip (...)",
        "extra": {"behave_backpack_2d_category_wallclock_min_per_chip": 61.0,
                  "coma_vs_torch_cpu": 4874.0},
    })
    floored = ("BENCH_r05.json", {
        "metric": "hoi_2d_images_per_sec_per_chip", "value": 0.6553,
        "vs_baseline": 1142.41,
        "unit": "img/s/chip (...) [CACHED: completed warm run ...]",
        "extra": {"hoi_2d_images_per_sec_cached": 0.6553,
                  "behave_backpack_2d_category_wallclock_min_per_chip": 61.0,
                  "coma_vs_torch_cpu": 4844.38,
                  "coma_vs_torch_cpu_source": "cached floor (...)"},
    })
    merged, prov = merge_records([real, floored])
    assert merged["value"] == 0.6557 and prov["value"] == "BENCH_r04.json"
    assert prov["behave_backpack_2d_category_wallclock_min_per_chip"] == \
        "BENCH_r04.json"
    assert prov["coma_vs_torch_cpu"] == "BENCH_r04.json"
    assert not any(k.endswith("_cached") for k in merged)

    # but a record with a LIVE headline still wins per-key-newest
    live = ("BENCH_r05.json", {
        "metric": "hoi_2d_images_per_sec_per_chip", "value": 0.7,
        "vs_baseline": 1200.0, "unit": "img/s/chip (...)",
        "extra": {"coma_vs_torch_cpu": 5000.0},
    })
    merged, prov = merge_records([real, live])
    assert merged["value"] == 0.7 and prov["value"] == "BENCH_r05.json"
    assert merged["coma_vs_torch_cpu"] == 5000.0
