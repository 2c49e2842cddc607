"""Per-stage timings for the in-loop PointRend detector (docs/KERNELS.md).

Reproduces the stage table "The in-loop PointRend detector" on the real
chip: backbone+fpn, rpn, detect (ROIAlign + NMS), pointrend masks,
paste+merge, and the two fused e2e variants (f32 exact, bf16+stride-4
fast) at the flagship bench configuration (B=16, scale-native 512,
random-init params — stage throughput is weight-independent).

Timing discipline (memory: the axon tunnel): every timed region ends in a
host value fetch, and the fixed ~30-55 ms fetch tax is differenced out by
timing a 1-chain and a 2-chain region (see docs/KERNELS.md "axon fetch
tax").

Usage: python tools/profile_pointrend_stages.py  (on the chip; ~minutes of
compiles on a cold cache)
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from coma_tpu.models.pointrend import (  # noqa: E402
    PointRendConfig,
    PointRendModel,
    make_pointrend_segment_fn,
    merged_person_mask,
)

B, RES = 16, 512


def timed_ms(fn, *args, chain_with=None):
    """Sustained per-call milliseconds: difference a 2-chain and a 1-chain
    region, each ending in one scalar fetch. ``chain_with`` re-invokes with
    the same args (stage outputs don't feed themselves)."""
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # completion barrier

    def run(chain):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            tot = jnp.zeros(())
            for _ in range(chain):
                o = fn(*args)
                tot = tot + jnp.sum(jax.tree.leaves(o)[0])
            float(tot)
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(2) - run(1)) * 1e3


def main():
    # in main(), not at module import: importing this tool must not mutate
    # global JAX config or create cache dirs (read-only-HOME environments)
    from coma_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()  # the fused e2e graphs take minutes cold

    cfg = PointRendConfig(test_size=RES, pre_nms_topk=256, post_nms_topk=128,
                          box_candidates=64, max_detections=8)
    model = PointRendModel(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((RES, RES, 3)))
    imgs = jax.random.uniform(key, (B, RES, RES, 3), jnp.float32)

    feats_fn = jax.jit(jax.vmap(
        lambda im: model.apply(params, im, method=PointRendModel.features)))
    feats = feats_fn(imgs)
    print(f"backbone+fpn     {timed_ms(feats_fn, imgs) / 1:8.1f} ms/batch")

    rpn_fn = jax.jit(jax.vmap(lambda f: model.apply(
        params, f, (RES, RES), method=PointRendModel.rpn)))
    props, valid = rpn_fn(feats)
    print(f"rpn (nms)        {timed_ms(rpn_fn, feats):8.1f} ms/batch")

    det_fn = jax.jit(jax.vmap(lambda f, p, v: model.apply(
        params, f, p, v, (RES, RES), method=PointRendModel.detect)))
    det = det_fn(feats, props, valid)
    print(f"detect (roi+nms) {timed_ms(det_fn, feats, props, valid):8.1f} ms/batch")

    mask_fn = jax.jit(jax.vmap(lambda f, b, c: model.apply(
        params, f["p2"], b, c, method=PointRendModel.point_rend_masks)))
    logits = mask_fn(feats, det["boxes"], det["classes"])
    print(f"pointrend masks  {timed_ms(mask_fn, feats, det['boxes'], det['classes']):8.1f} ms/batch")

    def paste(d):
        return jax.vmap(lambda dd: merged_person_mask(
            dd, (RES, RES), (1.0, 1.0)))(d)

    det_full = dict(det, mask_logits=logits)
    paste_fn = jax.jit(paste)
    paste_fn(det_full)
    print(f"paste+merge      {timed_ms(paste_fn, det_full):8.1f} ms/batch")

    for label, kw in (
        ("fused e2e f32 ", {}),
        ("fused e2e fast", dict(compute_dtype=jnp.bfloat16, paste_stride=4)),
    ):
        fn = jax.jit(lambda p, im, _kw=kw: make_pointrend_segment_fn(
            model, **_kw)(p, im))
        prm = {"pointrend": params}
        fn(prm, imgs)
        print(f"{label}   {timed_ms(fn, prm, imgs):8.1f} ms/batch")


if __name__ == "__main__":
    main()
