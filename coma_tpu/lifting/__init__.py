"""3D HOI lifting stage: cameras, rasterization, triangulation, depth
init/optimization, metrics (reference: ``src/generation/{initialize_depth,
optimize_depth,compute_metrics}.py``)."""
