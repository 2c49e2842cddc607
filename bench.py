"""Benchmark: the BASELINE.md north-star metric set, on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}:

- metric/value:   2D-HOI images/sec/chip — the flagship: the FULL adaptive-
  mask inpainting pipeline (512², 50 DDIM steps, CFG, bf16 UNet, 21 in-loop
  segment + VAE decode/encode rounds, one lax.scan) at the CLI's default
  batch 16, with the in-loop U-Net person segmenter. Reference workload:
  ``src/generation/inpaint.py:367,120,127`` +
  ``utils/adaptive_mask_inpainting.py:732-1109``. The reference-faithful
  in-loop PointRend configuration is captured alongside
  (``hoi_2d_images_per_sec_pointrend_loop``).
- vs_baseline:    measured on this host — a torch-CPU mirror of the same
  dominant work (50 CFG UNet steps + 21 x̂₀ VAE decodes per image). The
  reference publishes no numbers (BASELINE.md), so the baseline is the
  reference-style torch stack on the only hardware it can run on here.
- extra:          per-mode pipeline rates, UNet CFG-step latency + measured
  MFU, the ComA aggregation rates at the reference grid shapes, the
  production extract_coma path rate, the dp-sharded flagship scaling curve
  on a virtual mesh, and the measured mini-category e2e stage wall-clocks.

Harness design: the driver runs ``python bench.py`` under an external
timeout; this file is an ORCHESTRATOR that never touches the TPU backend
itself:

- every section runs in its own BOUNDED subprocess (guards are time-shaped,
  not exception-shaped — a section that merely runs long is killed, not
  waited on), sharing the persistent XLA compile cache;
- ALL jit-relevant builders live in ``coma_tpu/benchkit.py`` (VERDICT r4
  item 1): edits to THIS file cannot perturb what gets traced/compiled, so
  the compile cache survives harness edits by construction;
- sections run cheapest/headline-first; the mini-category e2e runs LAST and
  only if budget remains;
- a global wall-clock budget (env ``COMA_BENCH_BUDGET_S``, default 1560 s)
  gates every section start: a section that cannot fit in the remaining
  budget is skipped and recorded as ``skipped (budget)``;
- the final JSON line is printed exactly once, also on SIGTERM/SIGINT/
  normal-exit via atexit, with whatever has been measured by then;
- committed FLOOR CACHES (bench_{pipe,coma,dp}_cache.json — completed runs
  of the same section code on this host) merge at startup under
  ``<key>_cached`` names, so a round where the axon tunnel degrades
  server-side (observed: trivial device ops stalling 800+ s) still records
  every metric with honest provenance; if the live headline is missing the
  emitted ``value`` falls back to the cached one and the unit string says
  ``[CACHED: ...]``. Fresh results always land under the unsuffixed keys,
  and tools/update_readme_perf.py never promotes floor values into the
  driver-captured README table.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

DEFAULT_BUDGET_S = 1560.0


# ----------------------------------------------------------- sections
#
# Each section runs in its own subprocess (`python bench.py --section X`)
# and prints its result dict as the final `@@BENCH@@ {...}` line. The
# section bodies only CALL into coma_tpu.benchkit — no tracing happens in
# this file.


def section_coma() -> dict:
    from coma_tpu import benchkit as bk

    qual, qual_raw = bk.bench_coma_tpu()
    objc, _ = bk.bench_coma_tpu(h=1000, o=1500, iters=16)
    quant, _ = bk.bench_coma_tpu(h=750, o=2048, iters=16)
    occ, _ = bk.bench_occupancy_tpu()
    return {
        "coma_contact_aggregation_samples_per_sec": _round(qual, 3),
        "coma_object_contact_samples_per_sec": _round(objc, 3),
        "coma_quant_full_samples_per_sec": _round(quant, 3),
        "coma_occupancy_aggregation_samples_per_sec": _round(occ, 3),
        "coma_contact_chain_times_s": qual_raw,
    }


def section_unet_step() -> dict:
    from coma_tpu import benchkit as bk

    step_s, mfu = bk.bench_unet_step()
    return {"unet_cfg_step_ms": _round(step_s * 1e3, 2),
            "unet_step_mfu": _round(mfu, 4)}


def section_pipe_exact() -> dict:
    from coma_tpu import benchkit as bk

    return {"hoi_2d_images_per_sec": _round(
        bk._pipeline_rate(provoke_decode_factor=1), 4)}


def section_pipe_fast() -> dict:
    from coma_tpu import benchkit as bk

    return {"hoi_2d_images_per_sec_fast_mode": _round(
        bk._pipeline_rate(provoke_decode_factor=2), 4)}


def section_pipe_suite() -> dict:
    """Every flagship pipeline variant + the isolated UNet step in ONE
    subprocess (headline first): shares the backend attach, the imports and
    the SD param build, and prints one ``@@BENCH@@`` line per sub-result so
    a budget kill only costs the unmeasured tail (VERDICT r5 restructure —
    five standalone sections each paid ~770 s of non-timed overhead)."""
    from coma_tpu import benchkit as bk

    acc: dict = {}

    def emit(d):
        acc.update(d)
        print(SECTION_MARK + json.dumps(d), flush=True)

    bk.bench_pipe_suite(emit)
    return acc


def section_pipe_pointrend_both() -> dict:
    """Both in-loop PointRend variants in one subprocess: they share the
    imports and the backend attach (~60-90 s each on this tunnel), and they
    matter as a pair (exact vs --pointrend_fast)."""
    out = section_pipe_pointrend_fast()
    out.update(section_pipe_pointrend())
    return out


def section_pipe_modes() -> dict:
    """The two secondary decode modes (fast, crop) in one subprocess —
    same attach-sharing rationale."""
    out = section_pipe_fast()
    out.update(section_pipe_crop())
    return out


def section_pipe_crop() -> dict:
    # crop mode (`--provoke_crop`): decode/segment/re-encode only the
    # default-mask bbox window. Bucket chosen exactly as the CLI does, from
    # a typical person-extent mask (~200 px tall -> latent bucket 40).
    import numpy as np

    from coma_tpu import benchkit as bk
    from coma_tpu.models.diffusion.pipeline import choose_crop_latent

    _box = np.zeros((1, bk.RES, bk.RES), np.float32)
    _box[:, 156:356, 132:316] = 1.0
    crop_bucket = choose_crop_latent(_box)
    rate = bk._pipeline_rate(mask_box=200, provoke_crop_latent=crop_bucket)
    return {"hoi_2d_images_per_sec_crop_mode": _round(rate, 4),
            "crop_mode_latent_bucket": int(crop_bucket)}


def section_pipe_pointrend() -> dict:
    from coma_tpu import benchkit as bk

    return {"hoi_2d_images_per_sec_pointrend_loop": _round(
        bk._pipeline_rate(segmenter="pointrend"), 4)}


def section_pipe_pointrend_fast() -> dict:
    from coma_tpu import benchkit as bk

    return {"hoi_2d_images_per_sec_pointrend_loop_fast": _round(
        bk._pipeline_rate(segmenter="pointrend", pointrend_fast=True), 4)}


def section_torch_baselines() -> dict:
    from coma_tpu import benchkit as bk

    return {
        "inpaint_torch_cpu_imgs_per_sec": bk.bench_inpaint_torch_cpu(),
        "coma_torch_cpu_samples_per_sec": bk.bench_coma_torch_cpu(),
    }


def section_dp_scaling() -> dict:
    from coma_tpu import benchkit as bk

    return bk.bench_dp_scaling()


def section_extract_production() -> dict:
    """The full production extract_coma path (load -> prep -> fused scan ->
    export -> product) at the qual human-contact shape (VERDICT r4 item 5).
    The aggregation rate is emitted the moment it is measured — the state
    export that follows is ~3.9 GB over the ~19 MB/s tunnel, so a budget
    kill mid-export must not cost the compute metric."""
    from coma_tpu import benchkit as bk

    rate, breakdown = bk.bench_extract_production(
        emit=lambda d: print(SECTION_MARK + json.dumps(d), flush=True))
    return {"extract_coma_production_samples_per_sec": _round(rate, 3),
            "extract_coma_production_breakdown": breakdown}


def section_e2e() -> dict:
    """Measured mini-category end-to-end (real stage CLIs as subprocesses,
    host overheads included); time-boxed by the orchestrator. Emits a
    progressive partial after every stage so a budget kill still captures
    the measured prefix."""
    from bench_e2e import run_mini_category

    return {"mini_category_stage_seconds": run_mini_category(
        seeds=4, log=lambda *a: None,
        on_stage=lambda t: print(
            SECTION_MARK + json.dumps({"mini_category_stage_seconds": t}),
            flush=True))}


SECTION_FNS = {
    "pipe_suite": section_pipe_suite,
    "coma": section_coma,
    "unet_step": section_unet_step,
    "pipe_exact": section_pipe_exact,
    "torch_baselines": section_torch_baselines,
    "pipe_pointrend_fast": section_pipe_pointrend_fast,
    "pipe_pointrend": section_pipe_pointrend,
    "pipe_pointrend_both": section_pipe_pointrend_both,
    "pipe_fast": section_pipe_fast,
    "pipe_crop": section_pipe_crop,
    "pipe_modes": section_pipe_modes,
    "dp_scaling": section_dp_scaling,
    "extract_production": section_extract_production,
    "e2e": section_e2e,
}

# (name, needs_tpu, min_needed_s) in priority order. min_needed gates the
# section START against the remaining budget; once started, a section may
# use the WHOLE remaining budget — a fixed small cap proved actively
# harmful: killing a cold XLA compile mid-flight also forfeits the
# persistent-cache write, so the next attempt is cold again. The HEADLINE
# measurement leads pipe_suite (which emits incrementally, headline first),
# so a slow round can only cost secondary numbers, never the headline.
# min_needed is calibrated from warm-cache wall-clocks measured in round 5
# (each section's observed warm time + tunnel-attach variance); the compile
# cache makes warm the expected case since benchkit.py froze the traced code.
SECTION_PLAN = [
    ("pipe_suite",          True,  300),
    ("coma",                True,  120),
    ("dp_scaling",          False, 150),
    # extract emits its aggregation rate before the tunnel-bound ~200 s
    # state-export fetch, so it degrades gracefully at the budget edge;
    # dp_scaling (all-or-nothing) therefore runs first
    ("extract_production",  True,  120),
    # e2e emits one partial line per completed stage, so it usefully runs
    # on whatever scraps remain — a deadline kill keeps the measured prefix
    # (render+select+prompts alone fit in ~20 s; min_needed is set to the
    # smallest scrap that still captures a useful prefix)
    ("e2e",                 True,  40),
]

# torch_baselines never touches the chip, costs ~8 CPU-minutes, and its
# numbers are a constant of this host — so they are measured ONCE and cached
# in a committed file. Re-measuring concurrently with the TPU sections
# starved XLA compiles on this 1-CPU host: unet_step went 809 s with torch
# burning the core vs ~1-2 min alone. When the cache file is absent the
# section runs in the background as before (and writes the cache on
# success); delete the file to force a re-measure.
BACKGROUND_SECTION = "torch_baselines"
BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_baselines_cache.json")

# The measured mini-category e2e takes ~950 s on this harness (dominated by
# the lifting stages), which rarely fits the budget tail. Its last full
# measurement is committed with provenance and reported under the DISTINCT
# key `mini_category_stage_seconds_cached`; a live run (whenever budget
# allows) lands under `mini_category_stage_seconds` — fresh never clobbers
# cached, cached never masquerades as fresh.
E2E_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_e2e_cache.json")

# Last-known-good floors for the TPU sections, each a completed run of the
# SAME section code on this host's chip, committed with provenance. The axon
# tunnel intermittently degrades server-side (observed in round 5: a trivial
# ones.sum() stalling 800+ s, pipe_suite burning its whole window without
# finishing one warmup) — when that hits the driver's run, the live sections
# produce nothing. These caches are merged at startup under ``<key>_cached``
# names so a degraded round still records every metric with honest labeling;
# live results land under the unsuffixed keys and take precedence everywhere
# downstream (fresh never clobbers cached, cached never masquerades as
# fresh). If even the live headline is missing, _emit falls back to the
# cached headline and SAYS SO in the unit string.
FLOOR_CACHES = [
    ("pipe_cached", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_pipe_cache.json")),
    ("coma_cached", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_coma_cache.json")),
    ("dp_cached", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_dp_cache.json")),
]


def _load_floor_cache(label: str, path: str, extras: dict, sections: dict):
    """Merge a committed floor cache's values under ``<key>_cached`` names."""
    if not os.path.exists(path):
        return
    try:
        with open(path) as rf:
            cached = json.load(rf)
        extras.update({k + "_cached": v
                       for k, v in cached.get("values", {}).items()})
        sections[label] = {"status": "cached",
                           "measured_at": cached.get("measured_at")}
    except Exception as exc:
        sections[label] = {
            "status": f"cache unreadable: {type(exc).__name__}"}

# seconds to let the axon tunnel reclaim a just-killed client's HBM before
# the next section attaches (observed: sections started immediately after a
# kill hit RESOURCE_EXHAUSTED that a fresh chip doesn't produce)
SETTLE_S = 10.0

SECTION_MARK = "@@BENCH@@ "


def _round(x, nd):
    return round(x, nd) if isinstance(x, (int, float)) else None


def _device_reachable(timeout_s: int = 170, attempts: int = 2) -> bool:
    """Probe the accelerator in a BOUNDED subprocess before any section
    touches the backend: a dead axon tunnel hangs backend init indefinitely
    (no exception to degrade on). Sections are themselves time-bounded, so
    the probe only avoids burning the whole budget on a dead tunnel; it
    retries once because a single slow tunnel handshake (observed when a
    previous client just released the chip) must not zero a whole round.
    Handshake latency observed on this tunnel: 20 s to >120 s."""
    for i in range(attempts):
        if i:
            time.sleep(15)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print(float(jax.numpy.ones(()).sum()))"],
                capture_output=True, timeout=timeout_s,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _parse_marks(out: str) -> dict:
    """Merge every ``@@BENCH@@`` line a section printed (sections emit one
    line per sub-measurement so a kill can only cost the unmeasured tail)."""
    merged: dict = {}
    for line in (out or "").splitlines():
        if line.startswith(SECTION_MARK):
            try:
                merged.update(json.loads(line[len(SECTION_MARK):]))
            except json.JSONDecodeError:
                pass
    return merged


def _tpu_section_cap(plan_idx: int, remaining: float, min_needed: float,
                     sections: dict) -> float:
    """A TPU section on a degraded tunnel can stall for its entire window
    (observed round 5: pipe_suite burning 1396 s without one warmup while
    the probe had passed). Reserve the min_needed of every LATER CPU-only
    section still pending — those are the only fresh captures a degraded
    round is guaranteed to land — but never squeeze this section below its
    own min_needed."""
    reserve = sum(mn for nm, tpu, mn in SECTION_PLAN[plan_idx + 1:]
                  if not tpu and nm not in sections)
    return max(min_needed, remaining - reserve)


def _run_section(name: str, timeout_s: float):
    """Run one section subprocess; returns (result_dict_or_None, status)."""
    global _current_child
    cmd = [sys.executable, os.path.abspath(__file__), "--section", name]
    try:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        _current_child = proc
        try:
            out, err = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            partial = _parse_marks(out)
            if partial:
                return partial, f"timeout (partial: {len(partial)} keys)"
            return None, "timeout"
        finally:
            _current_child = None
    except Exception as exc:
        return None, f"spawn failed: {type(exc).__name__}"
    merged = _parse_marks(out)
    if proc.returncode != 0:
        tail = (err or "").strip().splitlines()[-3:]
        status = "failed: " + " | ".join(tail)[:240]
        if merged:
            return merged, f"{status} (partial: {len(merged)} keys)"
        return None, status
    if merged:
        return merged, "ok"
    return None, "no section output"


# --------------------------------------------------------- orchestrator

_emitted = False
_current_child = None
_bg_child = None


def _emit(extras: dict, sections: dict):
    """Print the one JSON line (idempotent — also runs from atexit)."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    imgs = extras.get("hoi_2d_images_per_sec")
    unit = ("img/s/chip (512², 50 DDIM, adaptive-mask, in-loop U-Net "
            "segmenter, batch 16; PointRend-in-loop rate in extra)")
    if imgs is None and extras.get("hoi_2d_images_per_sec_cached") is not None:
        # live pipe_suite produced nothing (degraded tunnel / budget kill):
        # fall back to the committed floor measurement, labeled as such
        imgs = extras["hoi_2d_images_per_sec_cached"]
        when = (sections.get("pipe_cached") or {}).get("measured_at", "?")
        unit += (f" [CACHED: completed warm run of the same section on this "
                 f"host's chip, {when} (bench_pipe_cache.json) — the live "
                 f"section did not finish this round]")
    base = extras.get("inpaint_torch_cpu_imgs_per_sec")
    coma_base = extras.get("coma_torch_cpu_samples_per_sec")
    coma_sps = (extras.get("coma_contact_aggregation_samples_per_sec")
                or extras.get("coma_contact_aggregation_samples_per_sec_cached"))
    out = {
        "metric": "hoi_2d_images_per_sec_per_chip",
        "value": _round(imgs, 4),
        "unit": unit,
        "vs_baseline": (round(imgs / base, 2) if (base and imgs) else None),
        "extra": {
            k: v for k, v in extras.items() if k != "hoi_2d_images_per_sec"
        },
    }
    # BASELINE.md north-star #3: BEHAVE-backpack 2D-stage category
    # wall-clock. Workload shape from the reference configs
    # (constants/generation/{assets,prompts}.py): 4 views x 10 perturbs x
    # 1 valid mask x (3 prompts x 2 viewpoint augs) x 10 seeds = 2400
    # images, projected from the measured rate.
    out["extra"]["behave_backpack_2d_category_wallclock_min_per_chip"] = (
        round(2400 / imgs / 60.0, 1) if imgs else None)
    out["extra"]["coma_vs_torch_cpu"] = (
        round(coma_sps / coma_base, 2) if (coma_base and coma_sps) else None)
    if ("coma_contact_aggregation_samples_per_sec" not in extras
            and out["extra"]["coma_vs_torch_cpu"] is not None):
        out["extra"]["coma_vs_torch_cpu_source"] = (
            "cached floor (bench_coma_cache.json) — live coma section did "
            "not finish this round")
    out["extra"]["baseline_def"] = (
        "torch-CPU mirrors on this host (reference publishes none)")
    out["extra"]["sections"] = sections
    print(json.dumps(out), flush=True)


def main():
    budget = float(os.environ.get("COMA_BENCH_BUDGET_S", DEFAULT_BUDGET_S))
    t_start = time.perf_counter()
    deadline = t_start + budget
    extras: dict = {}
    sections: dict = {}

    import atexit

    atexit.register(lambda: _emit(extras, sections))

    def on_signal(signum, frame):
        for child in (_current_child, _bg_child):
            if child is not None:
                try:
                    child.kill()
                    # sections emit one @@BENCH@@ line per sub-measurement;
                    # salvage what the in-flight section already measured
                    out, _ = child.communicate(timeout=5)
                    extras.update(_parse_marks(out))
                except Exception:
                    pass
        _emit(extras, sections)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    probe_t0 = time.perf_counter()
    sections["device_probe"] = {"status": "in progress"}
    tpu_ok = _device_reachable()
    if not tpu_ok:
        print("bench: accelerator unreachable (probe timed out); TPU "
              "sections will be skipped", file=sys.stderr)
    sections["device_probe"] = {
        "status": "ok" if tpu_ok else "unreachable",
        "seconds": round(time.perf_counter() - probe_t0, 1),
    }

    # torch-CPU baselines: host constants — use the committed cache when
    # present; only measure (in the background) when it is absent
    global _bg_child
    bg_proc = None
    bg_t0 = time.perf_counter()
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as rf:
                cached = json.load(rf)
            extras.update(cached.get("values", {}))
            sections[BACKGROUND_SECTION] = {
                "status": "cached", "measured_at": cached.get("measured_at")}
        except Exception as exc:
            sections[BACKGROUND_SECTION] = {
                "status": f"cache unreadable: {type(exc).__name__}"}
    else:
        try:
            bg_proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--section", BACKGROUND_SECTION],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            _bg_child = bg_proc
        except Exception as exc:
            sections[BACKGROUND_SECTION] = {
                "status": f"spawn failed: {type(exc).__name__}"}

    for label, path in FLOOR_CACHES:
        _load_floor_cache(label, path, extras, sections)

    if os.path.exists(E2E_CACHE):
        try:
            with open(E2E_CACHE) as rf:
                e2e_cached = json.load(rf)
            extras.update(e2e_cached.get("values", {}))
            sections["e2e_cached"] = {
                "status": "cached", "measured_at": e2e_cached.get("measured_at")}
        except Exception as exc:
            sections["e2e_cached"] = {
                "status": f"cache unreadable: {type(exc).__name__}"}

    skip_e2e = bool(os.environ.get("COMA_BENCH_SKIP_E2E"))
    prev_killed = False
    for plan_idx, (name, needs_tpu, min_needed) in enumerate(SECTION_PLAN):
        if name == "e2e" and skip_e2e:
            sections[name] = {"status": "skipped (COMA_BENCH_SKIP_E2E)"}
            continue
        if needs_tpu and not tpu_ok:
            sections[name] = {"status": "skipped (device unreachable)"}
            continue
        if needs_tpu and prev_killed:
            time.sleep(SETTLE_S)  # let the tunnel reclaim the killed client
            prev_killed = False
        remaining = deadline - time.perf_counter()
        if remaining < min_needed:
            sections[name] = {
                "status": f"skipped (budget: {remaining:.0f}s left, "
                          f"needs {min_needed}s)"}
            continue
        budget_cap = (_tpu_section_cap(plan_idx, remaining, min_needed,
                                       sections)
                      if needs_tpu else remaining)
        t0 = time.perf_counter()
        result, status = _run_section(name, budget_cap)
        if (result is None and needs_tpu and status.startswith("failed")
                and deadline - time.perf_counter() > min_needed):
            # transient tunnel faults (RESOURCE_EXHAUSTED right after a
            # client kill) are common enough to warrant one retry; a
            # worker CRASH (observed round 4: "TPU worker process crashed
            # or restarted") needs the chip to come back, which takes
            # closer to a minute than ten seconds
            crashy = ("crashed" in status or "RESOURCE_EXHAUSTED" in status
                      or "UNAVAILABLE" in status)
            time.sleep(60.0 if crashy else SETTLE_S)
            retry_result, status2 = _run_section(
                name, deadline - time.perf_counter())
            if retry_result:
                result = {**(result or {}), **retry_result}
            status = f"{status2} (retried: {status[:120]})"
        sections[name] = {"status": status,
                          "seconds": round(time.perf_counter() - t0, 1)}
        prev_killed = status.startswith("timeout")
        if result:
            extras.update(result)
        print(f"bench section {name}: {status} "
              f"({sections[name].get('seconds', '?')}s)", file=sys.stderr)

    if bg_proc is not None:
        try:
            out, _ = bg_proc.communicate(
                timeout=max(5.0, deadline - time.perf_counter()))
            status = "ok" if bg_proc.returncode == 0 else "failed"
            for line in reversed((out or "").splitlines()):
                if line.startswith(SECTION_MARK):
                    values = json.loads(line[len(SECTION_MARK):])
                    extras.update(values)
                    try:
                        with open(BASELINE_CACHE, "w") as wf:
                            json.dump({"values": values,
                                       "measured_at": time.strftime(
                                           "%Y-%m-%d %H:%M UTC", time.gmtime()),
                                       "host_cpus": os.cpu_count()}, wf)
                    except OSError:
                        pass
                    break
            else:
                status = "no section output" if status == "ok" else status
        except subprocess.TimeoutExpired:
            bg_proc.kill()
            bg_proc.communicate()
            status = "timeout"
        except Exception as exc:
            status = f"failed: {type(exc).__name__}"
        sections[BACKGROUND_SECTION] = {
            "status": status,
            "seconds": round(time.perf_counter() - bg_t0, 1),
            "concurrent": True,
        }

    _emit(extras, sections)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        from coma_tpu.cli._common import enable_compilation_cache

        enable_compilation_cache()
        result = SECTION_FNS[sys.argv[2]]()
        print(SECTION_MARK + json.dumps(result), flush=True)
    else:
        main()
