"""CLI: train the person segmenter and emit a loadable checkpoint.

The reference depends on an externally downloaded COCO PointRend checkpoint
(``INSTALL.md:56-69``); this trains the in-tree
:class:`~coma_tpu.models.segmentation.PersonSegmenter` on the procedural
articulated-person generator (:mod:`coma_tpu.models.synthetic_person`) so the
framework ships a self-contained person-mask model. The committed checkpoint
``coma_tpu/data/person_segmenter.npz`` was produced by this CLI on a TPU
v5e chip; ``tests/test_segmenter_checkpoint.py`` gates its quality (held-out
IoU).

TPU-first: one jitted train step; host data generation runs in a producer
thread so the chip never waits on numpy.
"""
from __future__ import annotations

import argparse
import queue
import threading
import time


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--out", type=str, default="coma_tpu/data/person_segmenter.npz")
    parser.add_argument("--eval_batches", type=int, default=8)
    parser.add_argument("--eval_seed", type=int, default=10_000,
                        help="held-out stream seed (the quality gate uses the same)")
    parser.add_argument("--domains", type=str, default="procedural,rendered",
                        help="comma list of training background domains "
                             "(procedural | rendered); 'rendered' composites "
                             "the capsule humans into textured-rasterizer "
                             "scenes — the stage-1 background distribution")
    parser.add_argument("--corrupt", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="SD-style corruption (blur/noise/JPEG/jitter)")
    parser.add_argument("--bg_pool_size", type=int, default=48)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--bf16_store", action="store_true", default=True)
    return parser


def main(argv=None) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from coma_tpu.models.segmentation import PersonSegmenter
    from coma_tpu.models.segmentation_train import SegTrainer
    from coma_tpu.models.synthetic_person import (
        person_batch,
        person_batch_domain,
        rendered_background_pool,
    )
    from coma_tpu.utils.checkpoint import save_params

    args = build_parser().parse_args(argv)

    domains = [d.strip() for d in args.domains.split(",") if d.strip()]
    known = {"procedural", "rendered"}
    if not domains or not set(domains) <= known:
        # a typo here would otherwise re-render a background pool every
        # batch (any unknown string falls through to 'rendered' handling
        # without the prebuilt pool) or hang the producer on an empty list
        raise SystemExit(
            f"--domains must be a non-empty comma list from {sorted(known)}; "
            f"got {args.domains!r}"
        )

    model = PersonSegmenter()
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(200, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.02,
    )
    trainer = SegTrainer(model, optax.adamw(sched, weight_decay=1e-4))
    state = trainer.init(jax.random.PRNGKey(args.seed), (args.size, args.size))
    step_fn = trainer.make_step()

    bg_pool = None
    if "rendered" in domains:
        print("[train_segmenter] pre-rendering background pool "
              f"({args.bg_pool_size} scenes)...", flush=True)
        bg_pool = rendered_background_pool(
            args.seed, n=args.bg_pool_size, size=args.size
        )

    q: "queue.Queue" = queue.Queue(maxsize=4)

    def producer():
        rng = np.random.default_rng(args.seed)
        for i in range(args.steps):
            dom = domains[i % len(domains)]
            q.put(person_batch_domain(
                rng, args.batch, args.size, background=dom,
                corrupt=args.corrupt, bg_pool=bg_pool,
            ))

    threading.Thread(target=producer, daemon=True).start()

    def save(params, path):
        if args.bf16_store:
            params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        save_params(params, path)

    t0 = time.time()
    for i in range(args.steps):
        imgs, masks = q.get()
        state, loss = step_fn(state, jnp.asarray(imgs), jnp.asarray(masks))
        # block every step: otherwise dispatch runs arbitrarily far ahead of
        # the device and the queued transfer buffers leak host RAM
        loss = float(loss)
        if (i + 1) % args.log_every == 0 or i == 0:
            print(
                f"[train_segmenter] step {i+1}/{args.steps} "
                f"loss {loss:.4f} ({time.time()-t0:.0f}s)",
                flush=True,
            )
        if (i + 1) % 1000 == 0:
            save(state["params"], args.out)  # periodic checkpoint

    # held-out IoU on the eval streams (same seeds as the quality-gate test):
    # in-distribution (procedural) + CROSS-DOMAIN (holdout textures/shapes
    # the model never trained on, with corruption)
    eval_rng = np.random.default_rng(args.eval_seed)
    ious = []
    for _ in range(args.eval_batches):
        imgs, masks = person_batch(eval_rng, args.batch, args.size)
        ious.append(float(trainer.iou(state["params"], jnp.asarray(imgs), jnp.asarray(masks))))
    miou = float(np.mean(ious))
    print(f"[train_segmenter] held-out IoU {miou:.4f} over {args.eval_batches} batches")

    holdout_pool = rendered_background_pool(
        args.eval_seed, n=16, size=args.size, holdout=True
    )
    cd_rng = np.random.default_rng(args.eval_seed + 1)
    cd_ious = []
    for _ in range(args.eval_batches):
        imgs, masks = person_batch_domain(
            cd_rng, args.batch, args.size, background="rendered_holdout",
            corrupt=True, bg_pool=holdout_pool,
        )
        cd_ious.append(float(trainer.iou(state["params"], jnp.asarray(imgs), jnp.asarray(masks))))
    cd_miou = float(np.mean(cd_ious))
    print(f"[train_segmenter] CROSS-DOMAIN holdout IoU {cd_miou:.4f}")

    params = state["params"]
    if args.bf16_store:
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    save_params(params, args.out)
    print(f"[train_segmenter] saved {args.out} (IoU {miou:.4f})")


if __name__ == "__main__":
    main()
