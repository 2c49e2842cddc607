"""Opt-in real-TPU test lane.

The main suite (``tests/``) pins JAX to a virtual 8-device CPU mesh and runs
the Pallas kernels through the interpreter. This directory is excluded from
default collection (``tests/conftest.py``) and runs the same kernels compiled
by Mosaic on the real chip:

    pytest tests/tpu -q     # requires a TPU (axon) device

Everything here skips cleanly when no TPU is attached.
"""
import pytest

import jax


def _tpu_available() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _tpu_available():
        return
    skip = pytest.mark.skip(reason="no TPU device attached")
    for item in items:
        item.add_marker(skip)
