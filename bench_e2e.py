"""Mini-category end-to-end wall-clock: the real stage CLIs, chip-to-disk.

Drives a 2-view x 1-mask x 1-prompt x N-seed slice of a category through
the production orchestrators (``generate_2d_hoi_images`` stages ->
``generate_3d_hoi_samples`` -> ``learn_coma``) in a scratch dir, at the real
512 px resolution and the real qual extraction hyperparameters, and times
each stage as a subprocess — host overheads (pickle IO, work-list builds,
process startup, re-jits) included. This replaces the earlier arithmetic
2400/rate estimate with a measured number (VERDICT r2 item 7).

Weights are random-init (the stages' documented fallback): stage *throughput*
is weight-independent, but garbage predictions make survival through the
pipeline's quality gates a coin flip — and a sentineled sample skips the
very compute this harness exists to time. Survival is therefore forced
deterministically, without touching any timed region:
- after the (timed) segment stage, seg pickles that found 0 or >2 people
  are rewritten to one fabricated person instance (count reported as
  ``segs_forced``);
- the optimize stage runs with RANSAC/triangulation thresholds wide open,
  so every sample does the full 200-step Adam fit;
- the filter thresholds are opened so the slice survives to extraction,
  and the run asserts extraction actually saved products.

Reference workload shape: ``scripts/generation/inpaint.sh:204-268`` +
``scripts/learn_coma.sh:42-64``.
"""
from __future__ import annotations

import glob
import os
import pickle
import subprocess
import sys
import tempfile
import time

SC = "Chair"
CAT = "Lounge Chair / Cafe Chair / Office Chair"
ASSET = "0a5a346c-cc3b-4280-b358-ccd1c4d8a865"

CUBE_V = [
    [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
    [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
]
CUBE_F = [
    [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
    [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
]


def _write_obj(path):
    with open(path, "w") as fh:
        for v in CUBE_V:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in CUBE_F:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")


def _write_sphere_obj(path, n_lat=419, n_lon=25):
    """UV-sphere with EXACTLY the SMPL-X vertex count (419*25 = 10475): the
    downsample indices computed on this template are applied to the sample
    meshes from predict_human's synthetic SMPL-X (same count), mirroring
    production where both share the real SMPL-X topology."""
    import math

    with open(path, "w") as fh:
        for i in range(n_lat):
            th = math.pi * (i + 0.5) / n_lat
            for j in range(n_lon):
                ph = 2 * math.pi * j / n_lon
                fh.write(f"v {math.sin(th) * math.cos(ph):.5f} "
                         f"{math.sin(th) * math.sin(ph):.5f} "
                         f"{math.cos(th):.5f}\n")
        for i in range(n_lat - 1):
            for j in range(n_lon):
                a = i * n_lon + j + 1
                b = i * n_lon + (j + 1) % n_lon + 1
                c = a + n_lon
                d = b + n_lon
                fh.write(f"f {a} {b} {d}\nf {a} {d} {c}\n")


def _force_person_segs(workdir: str) -> int:
    """Rewrite human_segs pickles that found 0 or >2 people to exactly one
    fabricated centered person instance (the test fixtures' schema,
    ``cli/segment_human.py:160-175``). Runs OUTSIDE any timed region; the
    count is reported so the forcing is visible in the bench record."""
    import numpy as np

    forced = 0
    for p in glob.glob(os.path.join(
            workdir, "results/generation/human_segs/**/*.pickle"),
            recursive=True):
        with open(p, "rb") as fh:
            seg = pickle.load(fh)
        n = 0 if isinstance(seg, str) else len(seg.get("pred_masks", ()))
        if 1 <= n <= 2:
            continue
        hw = (512, 512) if isinstance(seg, str) else tuple(seg["image_size"])
        mask = np.zeros(hw, bool)
        h, w = hw
        mask[h // 4: 3 * h // 4, w // 3: 2 * w // 3] = True
        ys, xs = np.nonzero(mask)
        with open(p, "wb") as fh:
            pickle.dump(dict(
                pred_masks=mask[None],
                pred_boxes=np.array(
                    [[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]],
                    np.float32),
                scores=np.array([0.99], np.float32),
                pred_classes=np.zeros(1, np.int64),
                image_size=hw,
            ), fh)
        forced += 1
    return forced


def run_mini_category(workdir: str = None, seeds: int = 16,
                      resolution: int = 512, tiny: bool = False,
                      log=print, on_stage=None,
                      hyperparams_keys=None) -> dict:
    """Returns {stage: seconds} plus 'total' and 'images'. ``tiny`` swaps in
    the 64 px smoke models (functional validation off-chip); the bench runs
    the real 512 px configuration."""
    repo = os.path.dirname(os.path.abspath(__file__))
    d = workdir or tempfile.mkdtemp(prefix="coma_mini_")
    obj = os.path.join(d, "asset.obj")
    _write_obj(obj)
    star = os.path.join(d, "star.obj")
    _write_sphere_obj(star)

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    times = {}

    def run(label, module, args):
        t0 = time.perf_counter()
        try:
            # bounded: a wedged TPU tunnel must fail the stage, not hang
            # the whole bench (compiles are cache-warm well under this)
            r = subprocess.run(
                [sys.executable, "-m", f"coma_tpu.cli.{module}", *args],
                cwd=d, env=env, capture_output=True, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired as exc:
            raise RuntimeError(
                f"mini-category stage {label} timed out after {exc.timeout}s"
            ) from None
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            raise RuntimeError(
                f"mini-category stage {label} failed:\n{r.stdout[-2000:]}\n"
                f"{r.stderr[-2000:]}"
            )
        times[label] = round(dt, 1)
        log(f"  [mini] {label:<14} {dt:7.1f} s")
        if on_stage is not None:
            # progressive partial results: a budget kill mid-run still
            # leaves the already-measured stage wall-clocks captured
            on_stage(dict(times))

    run("render", "render_objects", [
        "--obj_pth", obj, "--supercategory", SC, "--category", CAT,
        "--asset_id", ASSET, "--resolution", str(resolution), str(resolution),
        "--default_view_num", "2", "--default_perturb_sample_num", "1",
        "--default_stride_x", "0.5", "--default_stride_y", "0.5",
    ])
    run("select_mask", "select_mask", [
        "--default_min_seg_overlap_ratio", "0.0",
        "--default_max_seg_overlap_ratio", "1.0",
    ])
    # the reference picks masks/prompts by hand; trim to the 1x1 slice
    for p in glob.glob(os.path.join(
            d, "results/generation/valid_masks/**/*.pickle"), recursive=True):
        with open(p, "rb") as fh:
            info = pickle.load(fh)
        info["valid_mask_ids"] = info["valid_mask_ids"][:1]
        with open(p, "wb") as fh:
            pickle.dump(info, fh)
    run("prompts", "generate_prompts", [])
    for p in glob.glob(os.path.join(
            d, "results/generation/prompts/**/*.pickle"), recursive=True):
        with open(p, "rb") as fh:
            info = pickle.load(fh)
        info["prompts"] = info["prompts"][:1]  # 1 prompt (x2 viewpoint augs)
        with open(p, "wb") as fh:
            pickle.dump(info, fh)

    run("inpaint", "inpaint", [
        "--random_weights", "--num_img_per_combination", str(seeds),
        "--batch_size", str(seeds),
    ] + (["--tiny"] if tiny else []))
    images = len(glob.glob(os.path.join(
        d, "results/generation/inpaintings/**/*.png"), recursive=True))

    run("lift_segment", "generate_3d_hoi_samples", [
        "--asset_obj_pth", obj, "--batch_size", str(seeds),
        "--skip", "predict", "init", "optimize", "metrics",
    ])
    segs_forced = _force_person_segs(d)
    run("lift_rest", "generate_3d_hoi_samples", [
        "--asset_obj_pth", obj,
        "--no_collision", "--minimum_inliers", "1",
        # wide-open gates: every sample must do the full optimize/metrics
        # compute (random-weight joints otherwise sentinel out by luck)
        "--ransac_threshold", "1e9", "--triangulation_threshold", "1e9",
        "--voxel_resolution", "64",
        "--batch_size", str(seeds),
        "--skip", "segment",
    ])
    run("learn_coma", "learn_coma", [
        "--obj_pth", obj,
        "--supercategory", SC, "--category", CAT, "--asset_id", ASSET,
        "--smplx_star_pth", star,
        "--IoU_threshold_min", "0",
        "--intersection_volume_ratio_threshold_max", "1000000",
        "--inlier_num_threshold_min", "0",
    ] + (["--hyperparams_keys"] + list(hyperparams_keys)
         if hyperparams_keys else []))
    products = glob.glob(os.path.join(
        d, "results/coma/extracted_coma/**/*.pickle"), recursive=True)
    if not products:
        raise RuntimeError(
            "mini-category e2e reached extraction with zero surviving "
            "samples — stage timings would not represent production work")

    times["total"] = round(sum(v for v in times.values()
                               if isinstance(v, (int, float))), 1)
    times["images"] = images
    times["segs_forced"] = segs_forced
    times["extracted_products"] = len(products)
    return times


if __name__ == "__main__":
    tiny = "--tiny" in sys.argv
    out = run_mini_category(
        resolution=64 if tiny else 512, tiny=tiny,
        seeds=4 if tiny else 16,
        # tiny is a CPU functional smoke: the qual CONTACT grids
        # (10475x180x250) are chip-scale work; occupancy smokes the same
        # stage wiring at CPU-friendly cost
        hyperparams_keys=["qual:backpack_occupancy"] if tiny else None)
    import json

    print(json.dumps(out))
