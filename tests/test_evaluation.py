"""Tests for the MAE/SIM quantitative evaluation metrics."""
import numpy as np
import jax.numpy as jnp

from coma_tpu.affordance.evaluation import mean_absolute_error, quant_metrics, similarity


def test_sim_identical_is_one(rng):
    p = jnp.array(rng.uniform(size=64), dtype=jnp.float32)
    assert abs(float(similarity(p, p)) - 1.0) < 1e-5


def test_sim_disjoint_is_zero():
    p = jnp.array([1.0, 0.0, 0.0, 0.0])
    q = jnp.array([0.0, 0.0, 1.0, 0.0])
    assert float(similarity(p, q)) < 1e-6


def test_mae_known_value():
    p = jnp.array([1.0, 0.0])
    q = jnp.array([0.0, 1.0])
    # normalized dists: [1,0] vs [0,1] -> mean |diff| = 1.0
    np.testing.assert_allclose(float(mean_absolute_error(p, q)), 1.0, atol=1e-6)


def test_scale_invariance(rng):
    p = jnp.array(rng.uniform(size=32), dtype=jnp.float32)
    q = jnp.array(rng.uniform(size=32), dtype=jnp.float32)
    m1 = quant_metrics(p, q)
    m2 = quant_metrics(10.0 * p, 0.5 * q)
    assert abs(m1["sim"] - m2["sim"]) < 1e-5
    assert abs(m1["mae"] - m2["mae"]) < 1e-7


def test_batched_inputs(rng):
    p = jnp.array(rng.uniform(size=(4, 16)), dtype=jnp.float32)
    s = float(similarity(p, p))
    assert abs(s - 1.0) < 1e-5


def test_profiling_helpers(tmp_path):
    import os

    import jax.numpy as jnp

    from coma_tpu.utils.profiling import timed, trace

    f = lambda x: x * 2 + 1
    dt, out = timed(f, jnp.arange(8.0), iters=2)
    assert dt >= 0 and float(out[1]) == 3.0

    d = str(tmp_path / "tr")
    with trace(d):
        _ = f(jnp.arange(4.0)).sum()
    assert os.path.isdir(d) and len(os.listdir(d)) > 0
