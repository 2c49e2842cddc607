"""ComA-TPU: a TPU-native framework for learning Comprehensive Affordance.

A ground-up JAX/XLA/Pallas re-design of the capabilities of snuvclab/coma
(ECCV 2024): discovering contact, orientational tendency and spatial
occupancy affordances of 3D objects from pre-trained 2D diffusion models.

Layers (mirrors the reference layer map, SURVEY.md §1, re-architected
TPU-first):

- ``coma_tpu.affordance``  — the ComA math as pure, jit/vmap/shard-able
  functions over pytree accumulator states (reference: ``utils/coma.py``,
  ``utils/coma_occupancy.py``).
- ``coma_tpu.geometry``    — mesh IO, normals, downsampling, transforms
  (reference: ``utils/load_3d.py``, ``utils/transformations.py``).
- ``coma_tpu.models``      — JAX model zoo: SMPL-X LBS, diffusion inpainting,
  segmentation, VPoser, COAP (reference: ``imports/``).
- ``coma_tpu.lifting``     — 2D->3D lifting: ortho cameras, rasterizer,
  depth init/optimization, RANSAC-DLT triangulation, metrics (reference:
  ``src/generation/{initialize,optimize}_depth.py``, ``compute_metrics.py``).
- ``coma_tpu.ops``         — Pallas TPU kernels for the hot paths.
- ``coma_tpu.visualization`` — affordance viz exports + the per-step
  adaptive-mask video (reference: ``src/visualization/``,
  ``utils/visualization/``).
- ``coma_tpu.parallel``    — device-mesh sharding of work lists and
  accumulators (replaces the reference's bash/CUDA_VISIBLE_DEVICES
  process-per-GPU sharding, ``scripts/generation/*.sh``).
- ``coma_tpu.pipelines``   — the three pipeline stages (2D HOI generation,
  3D HOI lifting, ComA extraction) as batched jitted programs.
- ``coma_tpu.cli``         — command-line entry points with the reference's
  flag surface.
"""

__version__ = "0.1.0"
