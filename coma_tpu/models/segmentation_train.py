"""Training loop for the person segmenter (the PointRend replacement).

The reference depends on a pretrained detectron2 PointRend checkpoint
(``src/generation/segment_human.py:24``, weights external). Our
:class:`~coma_tpu.models.segmentation.PersonSegmenter` is a native Flax
U-Net with the same role; this module makes it trainable on TPU so the
person-mask model can be (re)trained from any person-segmentation dataset
(COCO person class, rendered SMPL-X silhouettes, ...) instead of depending
on a torch checkpoint.

TPU-first: one jitted train step (bf16-friendly U-Net, f32 loss), data
parallel over the mesh with ``jax.sharding`` constraints — drop-in for a
multi-chip pod via the same `Mesh` used everywhere else in the framework.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from coma_tpu.models.segmentation import PersonSegmenter


def bce_dice_loss(logits: jax.Array, masks: jax.Array, dice_weight: float = 1.0):
    """Pixel BCE + soft-Dice (the standard binary-seg pair; Dice keeps small
    persons from washing out under class imbalance). masks in {0, 1}."""
    logits = logits.astype(jnp.float32)
    masks = masks.astype(jnp.float32)
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, masks))
    probs = jax.nn.sigmoid(logits)
    inter = jnp.sum(probs * masks, axis=(1, 2))
    denom = jnp.sum(probs, axis=(1, 2)) + jnp.sum(masks, axis=(1, 2))
    dice = 1.0 - jnp.mean((2.0 * inter + 1.0) / (denom + 1.0))
    return bce + dice_weight * dice


@dataclasses.dataclass
class SegTrainer:
    """Jitted train/eval steps for a PersonSegmenter.

    Usage::

        trainer = SegTrainer(PersonSegmenter(), optax.adamw(3e-4))
        state = trainer.init(jax.random.PRNGKey(0), image_shape=(256, 256))
        for images, masks in loader:
            state, loss = trainer.step(state, images, masks)
    """

    model: PersonSegmenter
    tx: optax.GradientTransformation

    def init(self, rng, image_shape: Tuple[int, int] = (512, 512)):
        params = self.model.init(rng, jnp.zeros((1, *image_shape, 3)))
        return dict(params=params, opt=self.tx.init(params), step=jnp.zeros((), jnp.int32))

    def loss_fn(self, params, images, masks):
        logits = self.model.apply(params, images)
        return bce_dice_loss(logits, masks)

    @staticmethod
    def _shard_batch(batch, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = NamedSharding(mesh, P("data"))
        return jax.tree.map(lambda x: jax.device_put(x, spec), batch)

    def make_step(self, mesh=None):
        """Build the jitted train step; pass a Mesh for multi-chip data
        parallelism (params replicated, batch sharded — XLA inserts the
        gradient all-reduce)."""

        def step(state, images, masks):
            loss, grads = jax.value_and_grad(self.loss_fn)(
                state["params"], images, masks
            )
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            return dict(params=params, opt=opt, step=state["step"] + 1), loss

        jitted = jax.jit(step)
        if mesh is None:
            return jitted

        def sharded(state, images, masks):
            images, masks = self._shard_batch((images, masks), mesh)
            return jitted(state, images, masks)

        return sharded

    def step(self, state, images, masks):
        if not hasattr(self, "_step"):
            object.__setattr__(self, "_step", self.make_step())
        return self._step(state, images, masks)

    def iou(self, params, images, masks, threshold: float = 0.5):
        probs = jax.nn.sigmoid(self.model.apply(params, images))
        pred = (probs >= threshold).astype(jnp.float32)
        inter = jnp.sum(pred * masks, axis=(1, 2))
        union = jnp.sum(jnp.maximum(pred, masks), axis=(1, 2))
        return jnp.mean(inter / jnp.maximum(union, 1.0))


def synthetic_person_batch(rng, batch: int, size: int = 64):
    """Procedural training pairs: a bright person-ish ellipse blob on a dark
    textured background (smoke-test data; real training uses COCO-person or
    rendered SMPL-X silhouettes)."""
    import numpy as np

    imgs = rng.uniform(0.0, 0.35, size=(batch, size, size, 3)).astype(np.float32)
    masks = np.zeros((batch, size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(batch):
        cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
        ry = rng.integers(size // 8, size // 3)
        rx = max(2, int(ry * rng.uniform(0.35, 0.6)))  # person-ish aspect
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        masks[i][m] = 1.0
        tint = rng.uniform(0.6, 1.0, size=3).astype(np.float32)
        imgs[i][m] = tint * rng.uniform(0.7, 1.0)
    return imgs, masks
