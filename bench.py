"""Benchmark: ComA aggregation throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the qual:backpack_human_contact aggregation at reference scale —
H=10475 (FULL SMPL-X), O=180, N=250 (constants/coma/qual.py:2-33), i.e. one
sample update touches 2 × H·O·N ≈ 943M f32 accumulator elements.

Baseline: the reference publishes no numbers (BASELINE.md), so vs_baseline
is measured on this machine — a faithful torch implementation of the
reference's per-sample update (utils/coma.py:279-323 semantics, re-expressed
independently) on the host CPU, which is the only reference-executable
backend available here. The ratio is TPU-jitted samples/sec over torch-CPU
samples/sec.
"""
from __future__ import annotations

import json
import time

import numpy as np


H, O, N = 10475, 180, 250
SIGMA, GRID_SIZE, THRES, EPS = 0.25, 0.07, 0.03, 1e-10
TPU_WARMUP, TPU_ITERS = 1, 32
BASELINE_ITERS = 2


def make_samples(b):
    rng = np.random.default_rng(0)
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    return (
        (rng.normal(size=(b, H, 3)) * 0.3).astype(np.float32),
        unit(rng.normal(size=(b, H, 3))).astype(np.float32),
        (rng.normal(size=(b, O, 3)) * 0.3).astype(np.float32),
        unit(rng.normal(size=(b, O, 3))).astype(np.float32),
    )


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from coma_tpu.affordance.state import init_coma_state
    from coma_tpu.ops.contact_kernel import fused_contact_update_batch

    state = init_coma_state(H, O, N, GRID_SIZE, THRES, SIGMA, eps=EPS)
    hv, hn, ov, on = (jnp.asarray(x) for x in make_samples(TPU_ITERS))
    step = jax.jit(fused_contact_update_batch)

    # warmup / compile (same shapes as the timed run — one cache entry);
    # release the zero-init state so only one 3.8GB grid generation is live
    out = step(state, hv, hn, ov, on)
    del state
    float(out.used_count)  # scalar readback forces real completion

    t0 = time.perf_counter()
    out2 = step(out, hv, hn, ov, on)
    del out
    float(out2.used_count)
    dt = time.perf_counter() - t0
    return TPU_ITERS / dt


def bench_torch_cpu() -> float:
    """Reference-style torch update on host CPU (the measurable baseline)."""
    import torch

    grid_np = _fibonacci(N)
    grid = torch.tensor(grid_np, dtype=torch.float32)
    p = torch.tensor([0.0, 0.0, 1.0])
    q = torch.tensor([0.0, 1.0, 0.0])
    ph = torch.zeros(H, O, N)
    po = torch.zeros(H, O, N)
    nom = torch.zeros(H, O)
    sig = torch.zeros(H, O)

    def canon(a, b):
        c = b @ p
        w = torch.cross(b, p.expand_as(b), dim=-1)
        a_dot_w = a @ w.T
        out = (
            a_dot_w[:, :, None] * w[None] / (1.0 + c)[None, :, None]
            + c[None, :, None] * a[:, None, :]
            + (a @ b.T)[:, :, None] * p[None, None, :]
            - (a @ p)[:, None, None] * b[None, :, :]
        )
        return out / out.norm(dim=-1, keepdim=True)

    def splat(d):
        cos = torch.einsum("hok,nk->hon", d, grid).clamp(-1 + EPS, 1 - EPS)
        return torch.exp(-torch.arccos(cos) ** 2 / SIGMA**2)

    hv, hn, ov, on = (torch.tensor(x) for x in make_samples(BASELINE_ITERS))
    # avoid the singular branch in this benchmark copy: flip normals near -p
    hn = torch.where(hn[..., 2:3] < -0.99, -hn, hn)
    on = torch.where(on[..., 2:3] < -0.99, -on, on)

    t0 = time.perf_counter()
    for i in range(BASELINE_ITERS):
        d = (hv[i][:, None, :] - ov[i][None, :, :]).square().sum(-1).sqrt()
        sig += (d < THRES).float()
        nom += torch.exp(-d / GRID_SIZE)
        ph += splat(canon(hn[i], on[i]))
        po += splat(canon(on[i], hn[i]).permute(1, 0, 2))
    dt = time.perf_counter() - t0
    return BASELINE_ITERS / dt


def _fibonacci(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)], -1
    ).astype(np.float32)


def main():
    from coma_tpu.cli._common import enable_compilation_cache

    enable_compilation_cache()
    tpu = bench_tpu()
    try:
        baseline = bench_torch_cpu()
    except Exception:
        baseline = None
    print(
        json.dumps(
            {
                "metric": "coma_contact_aggregation_samples_per_sec",
                "value": round(tpu, 3),
                "unit": f"samples/s (H={H}, O={O}, N={N})",
                "vs_baseline": round(tpu / baseline, 2) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
