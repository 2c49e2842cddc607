"""Side-by-side photoreal comparison image for docs (VERDICT r3 item 7).

Renders the sphere-on-ground fixture three ways — flat Lambertian (the pre-r3
renderer), shadows+AO (r3), and the full photoreal stack (r4: + GGX specular,
sky/ground environment term, ACES filmic tonemap) — and writes
``docs/img/photoreal_compare.png``.

``--write-golden`` also regenerates ``tests/golden/photoreal_sphere.npz``
(the regression anchor for ``test_photoreal_golden_image``) — use after an
intentional shading change.

Usage: python tools/make_photoreal_compare.py [--write-golden]
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import jax.numpy as jnp

    from test_textured_rendering import _render_sphere, _sphere_scene

    from coma_tpu.lifting.rasterizer import make_sky_env

    s = _sphere_scene(res=256)
    flat = _render_sphere(s)
    # more AO/light directions than the (cheap) test config: the doc image
    # is about visual quality, discrete-direction petals would distract
    r3 = _render_sphere(s, ao_samples=32, light_samples=16, light_cone_deg=8.0)
    full_kw = dict(ao_samples=32, light_samples=16, light_cone_deg=8.0,
                   specular=0.5, roughness=0.35,
                   env_map=jnp.asarray(make_sky_env()), tonemap=True)
    full = _render_sphere(s, **full_kw)

    gap = np.ones((flat.shape[0], 4, 3), np.float32)
    panel = np.concatenate([flat, gap, r3, gap, full], axis=1)
    out = os.path.join(REPO, "docs", "img", "photoreal_compare.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    from PIL import Image

    Image.fromarray((panel * 255).astype(np.uint8)).save(out)
    print(f"wrote {out}  (left: Lambertian | middle: +shadows/AO | "
          f"right: +specular/env/tonemap)")

    if "--write-golden" in sys.argv:
        s64 = _sphere_scene()
        # MUST mirror test_photoreal_golden_image's render configuration
        rgb = _render_sphere(
            s64, ao_samples=8, light_samples=8, light_cone_deg=8.0,
            specular=0.5, roughness=0.35,
            env_map=jnp.asarray(make_sky_env()), tonemap=True)
        golden = os.path.join(REPO, "tests", "golden", "photoreal_sphere.npz")
        np.savez_compressed(golden, rgb=(rgb * 255).astype(np.uint8))
        print(f"wrote {golden}")


if __name__ == "__main__":
    main()
