"""Textured RGB rendering + per-dataset asset discovery.

Covers VERDICT item 4: MTL/UV-textured renders (the reference conditions SD
inpainting on Cycles RGB with materials, ``render_objects.py:90,309``) and
the six dataset adapters' enumeration (``render_objects.py:352-719``).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

from coma_tpu.config.assets import discover_assets
from coma_tpu.geometry.mesh import load_obj_textured


def _write(path, content):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)


@pytest.fixture()
def textured_quad(tmp_path):
    """A two-triangle quad with a red/blue half-split texture."""
    from PIL import Image

    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = [255, 0, 0]
    tex[:, 4:] = [0, 0, 255]
    Image.fromarray(tex).save(tmp_path / "tex.png")
    _write(
        str(tmp_path / "mat.mtl"),
        "newmtl painted\nKd 1.0 1.0 1.0\nmap_Kd tex.png\n",
    )
    _write(
        str(tmp_path / "quad.obj"),
        "mtllib mat.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl painted\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n",
    )
    return str(tmp_path / "quad.obj")


def test_load_obj_textured(textured_quad):
    m = load_obj_textured(textured_quad)
    assert m.vertices.shape == (4, 3)
    assert m.faces.shape == (2, 3)
    assert m.uvs.shape == (4, 2)
    assert m.face_uvs.shape == (2, 3)
    # material 0 is the default layer; 'painted' gets layer 1
    assert m.textures.shape[0] == 2
    assert (m.face_material == 1).all()
    # left half of the texture is red (rows x cols: v flipped at sample time)
    assert m.textures[1, 0, 0, 0] > 0.9 and m.textures[1, 0, 0, 2] < 0.1


def test_load_obj_textured_kd_only(tmp_path):
    _write(str(tmp_path / "m.mtl"), "newmtl green\nKd 0.1 0.9 0.2\n")
    _write(
        str(tmp_path / "a.obj"),
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl green\nf 1 2 3\n",
    )
    m = load_obj_textured(str(tmp_path / "a.obj"))
    np.testing.assert_allclose(m.textures[1, 3, 3], [0.1, 0.9, 0.2], atol=1e-6)
    assert (m.face_uvs == -1).all()  # no UVs present


def test_load_obj_textured_tab_separated_usemtl(tmp_path):
    """``usemtl\\tname`` is valid OBJ — the material must still bind
    (advisor r2: space-only detection silently fell back to default grey)."""
    _write(str(tmp_path / "m.mtl"), "newmtl green\nKd 0.1 0.9 0.2\n")
    _write(
        str(tmp_path / "a.obj"),
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl\tgreen\nf 1 2 3\n",
    )
    m = load_obj_textured(str(tmp_path / "a.obj"))
    assert (m.face_material == 1).all()
    np.testing.assert_allclose(m.textures[1, 3, 3], [0.1, 0.9, 0.2], atol=1e-6)


def test_render_textured_quad(textured_quad):
    import jax.numpy as jnp

    from coma_tpu.lifting.rasterizer import render_textured

    m = load_obj_textured(textured_quad)
    # orthographic identity projection: map [-1,1]² onto a 32² image
    v = m.vertices.astype(np.float32)
    px = (v[:, :2] + 1.0) * 16.0
    tri_px = np.concatenate(
        [px, np.ones((4, 1), np.float32)], axis=-1
    )[m.faces]
    tri_uv = m.uvs[m.face_uvs].astype(np.float32)
    tri_n = np.tile([[0.0, 0.0, 1.0]], (2, 1)).astype(np.float32)
    rgb, covered = render_textured(
        jnp.asarray(tri_px), jnp.asarray(tri_uv),
        jnp.asarray(m.face_material), jnp.asarray(tri_n),
        jnp.asarray(m.textures), 32, 32, flip_y=False,
    )
    rgb = np.asarray(rgb)
    assert np.asarray(covered).all()  # quad covers the full viewport
    # u < 0.5 (left in pixel x) samples red, u > 0.5 samples blue
    assert rgb[16, 4, 0] > rgb[16, 4, 2]
    assert rgb[16, 28, 2] > rgb[16, 28, 0]


def test_render_object_views_textured_ground(textured_quad):
    from coma_tpu.pipelines.rendering import (
        build_camera_ring,
        render_object_views_textured,
    )

    m = load_obj_textured(textured_quad)
    verts = m.vertices - [0, 0, m.vertices[:, 2].min() - 0.5]  # lift off ground
    cams = build_camera_ring(
        length_z=1.0, ortho_scale_world=6.0, view_num=1,
        elevation_deg=30.0, resolution=(48, 48),
    )
    seg, rgb = render_object_views_textured(cams[0], verts, m)
    assert seg.shape == (48, 48) and rgb.shape == (48, 48, 3)
    assert seg.max() == 255
    # the scene is not a flat constant: object pixels differ from ground
    obj_px = rgb[seg > 0]
    ground_px = rgb[seg == 0]
    assert abs(float(obj_px.mean()) - float(ground_px.mean())) > 5


# ------------------------------------------------------- dataset adapters


def test_discover_3d_future(tmp_path):
    root = tmp_path / "fut"
    _write(
        str(root / "model_info.json"),
        json.dumps(
            [
                {"model_id": "0a5a346c-cc3b-4280-b358-ccd1c4d8a865",
                 "super-category": "Chair",
                 "category": "Lounge Chair / Cafe Chair / Office Chair"},
                {"model_id": "not-whitelisted", "super-category": "Chair",
                 "category": "Lounge Chair / Cafe Chair / Office Chair"},
            ]
        ),
    )
    found = discover_assets("3D-FUTURE", {"3D-FUTURE": str(root)})
    assert len(found) == 1
    sc, cat, aid, pth = found[0]
    assert aid == "0a5a346c-cc3b-4280-b358-ccd1c4d8a865"
    assert pth.endswith(f"{aid}/raw_model.obj")
    unfiltered = discover_assets(
        "3D-FUTURE", {"3D-FUTURE": str(root)}, restrict_to_whitelist=False
    )
    assert len(unfiltered) == 2


def test_discover_shapenet(tmp_path):
    root = tmp_path / "shapenet"
    _write(str(root / "taxonomy.json"),
           json.dumps([{"name": "motorcycle,bike", "synsetId": "03790512"}]))
    os.makedirs(root / "03790512" / "model_x" / "models")
    _write(str(root / "03790512" / "model_x" / "models" / "model_normalized.obj"), "")
    # real ShapeNet model dirs hold several entries — none may cause a
    # duplicate render job (advisor r2: each entry used to emit one)
    os.makedirs(root / "03790512" / "model_x" / "images")
    os.makedirs(root / "03790512" / "model_x" / "screenshots")
    _write(str(root / "03790512" / "model_x" / "model.json"), "{}")
    found = discover_assets(
        "SHAPENET", {"SHAPENET": str(root)}, restrict_to_whitelist=False
    )
    assert found == [
        ("motorcycle,bike", "motorcycle,bike", "model_x",
         f"{root}/03790512/model_x/models/model_normalized.obj")
    ]


def test_discover_behave_intercap(tmp_path):
    b = tmp_path / "behave"
    _write(str(b / "objects" / "backpack" / "backpack.obj"), "")
    found = discover_assets("BEHAVE", {"BEHAVE": str(b)})
    assert found == [
        ("BEHAVE", "backpack", "behave_asset", f"{b}/objects/backpack/backpack.obj")
    ]
    i = tmp_path / "intercap"
    _write(str(i / "objects" / "suitcase" / "mesh.obj"), "")
    found = discover_assets("INTERCAP", {"INTERCAP": str(i)})
    assert found == [
        ("INTERCAP", "suitcase", "intercap_asset", f"{i}/objects/suitcase/mesh.obj")
    ]


def test_discover_sketchfab_categories_module(tmp_path):
    root = tmp_path / "sketchfab"
    _write(
        str(root / "categories.py"),
        "_CATEGORIES_3D = [{'super-category': 'Gym', 'category': 'dumbbell'}]\n",
    )
    _write(str(root / "Gym" / "model_a" / "model.obj"), "")
    found = discover_assets(
        "SKETCHFAB", {"SKETCHFAB": str(root)}, restrict_to_whitelist=False
    )
    assert found == [("Gym", "dumbbell", "model_a", f"{root}/Gym/model_a/model.obj")]


# ------------------------------------------------------------- shadows


def test_shadow_pass_directional():
    """VERDICT r2 item 6: a floating quad under a tilted light casts a
    displaced shadow onto the ground plane (reference: Cycles area light,
    ``utils/blenderproc.py:100-113``)."""
    import jax.numpy as jnp

    from coma_tpu.lifting.rasterizer import render_textured

    # ground quad z=0 over [-2,2]², occluder quad z=1 over [-0.5,0.5]²
    g = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32)
    o = g * 0.25 + [0, 0, 1]
    quads = np.array([[0, 1, 2], [0, 2, 3]])
    tri_w = np.concatenate([g[quads], o[quads]])
    # overhead orthographic camera: x right, y up, depth = -z
    px = (tri_w[..., :2] + 2.0) / 4.0 * 64.0
    tri_px = np.concatenate([px, -tri_w[..., 2:]], axis=-1)
    tri_uv = np.zeros((4, 3, 2), np.float32)
    tri_mat = np.zeros(4, np.int32)
    tri_n = np.tile([[0.0, 0.0, 1.0]], (4, 1)).astype(np.float32)
    tex = np.full((1, 4, 4, 3), 1.0, np.float32)

    def render(**kw):
        rgb, _ = render_textured(
            jnp.asarray(tri_px), jnp.asarray(tri_uv), jnp.asarray(tri_mat),
            jnp.asarray(tri_n), jnp.asarray(tex), 64, 64, flip_y=False,
            light_dir=(1.0, 0.0, 1.0), ambient=0.3, **kw,
        )
        return np.asarray(rgb)

    lit = render()
    shad = render(tri_w=jnp.asarray(tri_w))
    # light from +x overhead: ground at x=-1 (pixel x≈16) is in shadow,
    # ground at x=+1 (pixel x≈48) is lit; y=0 -> pixel y≈32
    assert shad[32, 16].mean() < shad[32, 48].mean() - 0.2
    # the shadowed pixel falls to the ambient floor
    np.testing.assert_allclose(shad[32, 16].mean(), lit[32, 16].mean() * 0.3
                               / (0.3 + 0.7 * abs(2 ** -0.5)), atol=0.1)
    # without tri_w nothing darkens
    assert abs(lit[32, 16].mean() - lit[32, 48].mean()) < 1e-5
    # the occluder itself stays lit on top
    assert shad[32, 32].mean() > shad[32, 16].mean() + 0.2


def test_ambient_occlusion_contact_darkening():
    """AO darkens ground pixels near an occluder and leaves open ground
    untouched (the one-bounce-GI contact darkening of Cycles)."""
    import jax.numpy as jnp

    from coma_tpu.lifting.rasterizer import (
        cosine_hemisphere_dirs,
        render_textured,
    )

    # cosine sampling invariants: unit +z hemisphere, E[z] = 2/3
    d = np.asarray(cosine_hemisphere_dirs(64))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 2] > 0).all()
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=0.05)

    # ground quad z=0 over [-2,2]², occluder quad hovering at z=0.15
    g = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32)
    o = g * 0.25 + [0, 0, 0.15]
    quads = np.array([[0, 1, 2], [0, 2, 3]])
    tri_w = np.concatenate([g[quads], o[quads]])
    px = (tri_w[..., :2] + 2.0) / 4.0 * 64.0
    tri_px = np.concatenate([px, -tri_w[..., 2:]], axis=-1)
    tri_uv = np.zeros((4, 3, 2), np.float32)
    tri_mat = np.zeros(4, np.int32)
    tri_n = np.tile([[0.0, 0.0, 1.0]], (4, 1)).astype(np.float32)
    tex = np.full((1, 4, 4, 3), 1.0, np.float32)

    def render(**kw):
        rgb, _ = render_textured(
            jnp.asarray(tri_px), jnp.asarray(tri_uv), jnp.asarray(tri_mat),
            jnp.asarray(tri_n), jnp.asarray(tex), 64, 64, flip_y=False,
            light_dir=(0.0, 0.0, 1.0), ambient=0.5,
            tri_w=jnp.asarray(tri_w), shadow_casters=jnp.asarray(o[quads]),
            **kw,
        )
        return np.asarray(rgb)

    base = render()
    ao = render(ao_samples=16)
    # ground just outside the occluder edge (x≈+0.6 -> px≈41): the hovering
    # quad blocks much of its sky -> darker with AO
    assert ao[32, 41].mean() < base[32, 41].mean() - 0.05
    # open ground far away (x≈+1.8 -> px≈60) keeps nearly full ambient
    assert abs(ao[32, 60].mean() - base[32, 60].mean()) < 0.02
    # AO only darkens
    assert (base - ao).min() >= -1e-5


@pytest.mark.slow  # ~8 s; test_shadow_pass_directional is the fast-lane representative
def test_area_light_soft_shadow_penumbra():
    """Cone-sampled light directions produce an area-light penumbra: more
    intermediate-intensity ground pixels than the hard directional light,
    while fully-lit and deep-umbra regions keep their values."""
    import jax.numpy as jnp

    from coma_tpu.lifting.rasterizer import render_textured

    g = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32)
    o = g * 0.25 + [0, 0, 1.0]  # occluder hovering high -> wide penumbra
    quads = np.array([[0, 1, 2], [0, 2, 3]])
    tri_w = np.concatenate([g[quads], o[quads]])
    px = (tri_w[..., :2] + 2.0) / 4.0 * 128.0
    tri_px = np.concatenate([px, -tri_w[..., 2:]], axis=-1)
    tri_uv = np.zeros((4, 3, 2), np.float32)
    tri_mat = np.zeros(4, np.int32)
    tri_n = np.tile([[0.0, 0.0, 1.0]], (4, 1)).astype(np.float32)
    tex = np.full((1, 4, 4, 3), 1.0, np.float32)

    def render(**kw):
        rgb, _ = render_textured(
            jnp.asarray(tri_px), jnp.asarray(tri_uv), jnp.asarray(tri_mat),
            jnp.asarray(tri_n), jnp.asarray(tex), 128, 128, flip_y=False,
            light_dir=(0.0, 0.0, 1.0), ambient=0.2, pcf=1,
            tri_w=jnp.asarray(tri_w), shadow_casters=jnp.asarray(o[quads]),
            **kw,
        )
        return np.asarray(rgb)[..., 0]

    hard = render()
    soft = render(light_samples=16, light_cone_deg=15.0)
    lo, hi = 0.2 + 1e-3, 1.0 - 1e-3
    inter_hard = ((hard > lo) & (hard < hi)).sum()
    inter_soft = ((soft > lo) & (soft < hi)).sum()
    assert inter_soft > inter_hard + 100  # a real penumbra band appears
    # umbra center stays dark, open ground stays lit
    assert abs(soft[64, 64] - hard[64, 64]) < 0.05
    np.testing.assert_allclose(soft[64, 5], hard[64, 5], atol=0.02)


# ------------------------------------------ specular / env / tonemap ----


def _sphere_scene(res=64, n_lat=24, n_lon=24):
    """A unit sphere over a ground plane, overhead ortho camera — curved
    normals make specular highlights and the sky term visible."""
    import math

    verts = []
    for i in range(n_lat):
        th = math.pi * (i + 0.5) / n_lat
        for j in range(n_lon):
            ph = 2 * math.pi * j / n_lon
            verts.append([math.sin(th) * math.cos(ph),
                          math.sin(th) * math.sin(ph),
                          math.cos(th) + 1.0])  # resting on z=0
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            faces += [[a, b, b + n_lon], [a, b + n_lon, a + n_lon]]
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int32)
    g = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32)
    quads = np.array([[0, 1, 2], [0, 2, 3]])
    tri_w = np.concatenate([v[f], g[quads]])
    e1 = tri_w[:, 1] - tri_w[:, 0]
    e2 = tri_w[:, 2] - tri_w[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    px = (tri_w[..., :2] + 2.0) / 4.0 * res
    tri_px = np.concatenate([px, -tri_w[..., 2:]], axis=-1).astype(np.float32)
    T = len(tri_w)
    return dict(
        tri_px=tri_px, tri_w=tri_w.astype(np.float32),
        tri_uv=np.zeros((T, 3, 2), np.float32),
        tri_mat=np.zeros(T, np.int32), tri_n=n.astype(np.float32),
        casters=tri_w[: len(f)].astype(np.float32),
        tex=np.full((1, 4, 4, 3), 0.6, np.float32), res=res,
    )


def _render_sphere(s, shadows=True, **kw):
    """``shadows=False`` drops the world-space pass (no shadow map / AO
    machinery compiles) — the specular/env property tests assert on shading
    terms that don't involve visibility, and the shadow-bearing configs
    each cost a distinct multi-pass compile on the CPU CI host."""
    import jax.numpy as jnp

    from coma_tpu.lifting.rasterizer import render_textured

    if shadows:
        kw = dict(tri_w=jnp.asarray(s["tri_w"]),
                  shadow_casters=jnp.asarray(s["casters"]), **kw)
    rgb, _ = render_textured(
        jnp.asarray(s["tri_px"]), jnp.asarray(s["tri_uv"]),
        jnp.asarray(s["tri_mat"]), jnp.asarray(s["tri_n"]),
        jnp.asarray(s["tex"]), s["res"], s["res"], flip_y=False,
        light_dir=(0.4, 0.0, 1.0), ambient=0.3,
        **kw,
    )
    return np.asarray(rgb)


def test_specular_highlight():
    """GGX specular puts a bright lobe near the half-vector-aligned normals
    and leaves grazing regions Lambertian (reference fidelity target: the
    Cycles Principled BSDF, ``blenderproc.py:100-113``)."""
    s = _sphere_scene()
    base = _render_sphere(s, shadows=False)
    spec = _render_sphere(s, shadows=False, specular=0.6, roughness=0.3)
    diff = spec - base
    assert diff.min() >= -1e-5  # specular only adds energy
    # highlight: the brightest gain sits on the sphere's light-facing side
    # (light from +x overhead -> highlight right of center)
    gain = diff.mean(-1)
    yy, xx = np.unravel_index(gain.argmax(), gain.shape)
    assert gain.max() > 0.15
    assert xx > s["res"] // 2
    # ground far from the sphere gains almost nothing (normals misaligned)
    assert gain[4, 4] < 0.05


def test_env_map_sky_term():
    """A sky/ground environment makes upward-facing pixels cooler/brighter
    than the flat-ambient render in the BLUE channel specifically."""
    from coma_tpu.lifting.rasterizer import make_sky_env, sample_env

    env = make_sky_env()
    assert env.shape[-1] == 3 and float(env.min()) >= 0.0
    # zenith is bluer than the ground band
    import jax.numpy as jnp

    up = np.asarray(sample_env(jnp.asarray(env), jnp.asarray([[0.0, 0.0, 1.0]])))[0]
    dn = np.asarray(sample_env(jnp.asarray(env), jnp.asarray([[0.0, 0.0, -1.0]])))[0]
    assert up[2] > dn[2] + 0.2

    s = _sphere_scene()
    flat = _render_sphere(s, shadows=False)
    sky = _render_sphere(s, shadows=False, env_map=jnp.asarray(env))
    # the ground plane (normal +z) sees the sky: blue/red balance shifts up
    br_flat = flat[4, 4, 2] - flat[4, 4, 0]
    br_sky = sky[4, 4, 2] - sky[4, 4, 0]
    assert br_sky > br_flat + 0.01


def test_filmic_tonemap_rolloff():
    from coma_tpu.lifting.rasterizer import filmic_tonemap

    import jax.numpy as jnp

    x = jnp.asarray([0.0, 0.18, 1.0, 4.0])
    y = np.asarray(filmic_tonemap(x))
    assert y[0] == 0.0
    assert 0.1 < y[1] < 0.3          # mid-grey stays mid
    assert 0.7 < y[2] < 0.95         # shoulder: 1.0 maps below clip
    assert y[3] > y[2] and y[3] <= 1.0  # highlights compress, don't clip flat
    # monotone
    assert (np.diff(y) > 0).all()


def test_tonemap_preserves_flat_background():
    """The flat backdrop is display-referred: tonemap applies to covered
    pixels only, so a white background stays 255-white (advisor r4 — ACES
    used to pull it to ~0.80 gray)."""
    import jax.numpy as jnp

    from coma_tpu.lifting.rasterizer import render_textured

    tri = jnp.asarray([[[2.0, 2.0, 0.0], [6.0, 2.0, 0.0], [4.0, 6.0, 0.0]]])
    img, cov = render_textured(
        tri, jnp.zeros((1, 3, 2)), jnp.zeros((1,), jnp.int32),
        jnp.asarray([[0.0, 0.0, 1.0]]), jnp.full((1, 4, 4, 3), 0.5),
        32, 32, tonemap=True)
    img, cov = np.asarray(img), np.asarray(cov)
    assert np.allclose(img[~cov], 1.0)
    assert cov.any() and (img[cov] < 1.0).any()


@pytest.mark.slow
def test_photoreal_golden_image():
    """Golden-image regression for the full photoreal stack (shadows + AO +
    soft light + GGX specular + sky env + filmic tonemap) on the sphere-on-
    ground fixture — the render configuration the BEHAVE-backpack category
    uses (VERDICT r3 item 7). Regenerate with
    ``python tools/make_photoreal_compare.py --write-golden`` after an
    intentional change.

    Slow lane: the all-features graph is the most expensive compile in the
    render test set (~60 s cold on the 1-core CI host); each feature keeps
    its own fast-lane property test above."""
    import jax.numpy as jnp

    from coma_tpu.lifting.rasterizer import make_sky_env

    s = _sphere_scene()
    rgb = _render_sphere(
        s, ao_samples=8, light_samples=8, light_cone_deg=8.0,
        specular=0.5, roughness=0.35, env_map=jnp.asarray(make_sky_env()),
        tonemap=True,
    )
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "photoreal_sphere.npz")
    if not os.path.exists(path):  # first run bootstraps the golden
        np.savez_compressed(path, rgb=(rgb * 255).astype(np.uint8))
    want = np.load(path)["rgb"].astype(np.float32) / 255.0
    np.testing.assert_allclose(rgb, want, atol=2.5 / 255.0)


def test_render_object_views_textured_contact_shadow(textured_quad):
    """Pipeline-level: a grounded object produces a contact shadow in the
    default (shadows=True) render and none with shadows=False."""
    from coma_tpu.pipelines.rendering import (
        build_camera_ring,
        render_object_views_textured,
    )

    m = load_obj_textured(textured_quad)
    # tilt the quad so it stands above the ground and can cast
    verts = m.vertices.astype(np.float64).copy()
    verts[:, 2] = verts[:, 1] * 0.5 + 0.6  # slanted, hovering near ground
    cams = build_camera_ring(
        length_z=1.0, ortho_scale_world=6.0, view_num=1,
        elevation_deg=45.0, resolution=(64, 64),
    )
    seg_s, rgb_s = render_object_views_textured(cams[0], verts, m)
    seg_n, rgb_n = render_object_views_textured(cams[0], verts, m,
                                                shadows=False)
    np.testing.assert_array_equal(seg_s, seg_n)  # segmap untouched
    ground_s = rgb_s[seg_s == 0].astype(np.float32)
    ground_n = rgb_n[seg_n == 0].astype(np.float32)
    # shadows only darken; some ground pixels darken a lot
    assert float(ground_s.min()) < float(ground_n.min()) - 30
    assert float((ground_n.astype(np.int32) - ground_s).min()) >= 0


# ----------------------------------------------- one-bounce GI (RSM, r5)


def _floor_wall_scene():
    """White floor on z=0, red wall standing at y=0 — the classic color-
    bleeding fixture. Camera is orthographic top-down (depth = -z)."""
    import jax.numpy as jnp

    W = 8.0
    floor = np.asarray([
        [[0, 0, 0], [W, 0, 0], [W, W, 0]],
        [[0, 0, 0], [W, W, 0], [0, W, 0]],
    ], np.float32)
    wall = np.asarray([
        [[0, 0.01, 0], [W, 0.01, 0], [W, 0.01, 2.5]],
        [[0, 0.01, 0], [W, 0.01, 2.5], [0, 0.01, 2.5]],
    ], np.float32)
    tri_w = np.concatenate([floor, wall])                    # (4, 3, 3)
    n = np.asarray([[0, 0, 1], [0, 0, 1], [0, 1, 0], [0, 1, 0]], np.float32)
    mat = np.asarray([1, 1, 2, 2], np.int32)                 # floor=white, wall=red
    textures = np.stack([
        np.full((4, 4, 3), 0.5, np.float32),                 # 0: default
        np.ones((4, 4, 3), np.float32),                      # 1: white
        np.tile(np.asarray([1.0, 0.05, 0.05], np.float32), (4, 4, 1)),  # 2: red
    ])
    uv = np.zeros((4, 3, 2), np.float32)
    res = 32
    scale = res / W
    tri_px = np.stack([
        tri_w[..., 0] * scale, tri_w[..., 1] * scale, -tri_w[..., 2]
    ], axis=-1).astype(np.float32)
    return (jnp.asarray(tri_px), jnp.asarray(uv), jnp.asarray(mat),
            jnp.asarray(n), jnp.asarray(textures), jnp.asarray(tri_w), res)


def test_rsm_gi_color_bleeding():
    """Floor pixels near the lit red wall must gain RED indirect light
    (VERDICT r4 item 8: the single-bounce term AO/shadows cannot express);
    far pixels gain much less; gi_samples=0 reproduces the old image."""
    from coma_tpu.lifting.rasterizer import render_textured

    tri_px, uv, mat, n, tex, tri_w, res = _floor_wall_scene()
    kw = dict(height=res, width=res, flip_y=False, tri_w=tri_w,
              light_dir=(0.0, 0.6, 0.8), ambient=0.2, chunk=4)
    base, cov = render_textured(tri_px, uv, mat, n, tex, **kw)
    gi, _ = render_textured(tri_px, uv, mat, n, tex, gi_samples=24, **kw)
    base, gi, cov = np.asarray(base), np.asarray(gi), np.asarray(cov)

    delta = gi - base
    assert (delta >= -1e-5).all(), "indirect light must be additive"
    # near-wall floor rows (small y = small pixel row): red bleed
    near = delta[2:6, 8:24]
    far = delta[26:30, 8:24]
    assert near[..., 0].mean() > 0.01, "no indirect near the red wall"
    assert near[..., 0].mean() > 3 * near[..., 1].mean(), "bleed is not red"
    assert near[..., 0].mean() > 3 * max(far[..., 0].mean(), 1e-6), (
        "indirect does not fall off with distance")


def test_rsm_gi_strength_scales_linearly():
    from coma_tpu.lifting.rasterizer import render_textured

    tri_px, uv, mat, n, tex, tri_w, res = _floor_wall_scene()
    kw = dict(height=res, width=res, flip_y=False, tri_w=tri_w,
              light_dir=(0.0, 0.6, 0.8), ambient=0.2, chunk=4)
    base, _ = render_textured(tri_px, uv, mat, n, tex, **kw)
    g1, _ = render_textured(tri_px, uv, mat, n, tex, gi_samples=16,
                            gi_strength=1.0, **kw)
    g2, _ = render_textured(tri_px, uv, mat, n, tex, gi_samples=16,
                            gi_strength=2.0, **kw)
    d1 = np.asarray(g1) - np.asarray(base)
    d2 = np.asarray(g2) - np.asarray(base)
    # linear in gi_strength wherever the sum is not clipped at 1
    unclipped = np.asarray(g2) < 0.999
    np.testing.assert_allclose(d2[unclipped], 2.0 * d1[unclipped],
                               rtol=1e-4, atol=1e-5)


def test_render_object_views_textured_gi(textured_quad):
    """Pipeline-level smoke: --gi_samples flows through to the renderer and
    changes covered pixels only additively."""
    from coma_tpu.pipelines.rendering import (
        build_camera_ring,
        render_object_views_textured,
    )

    m = load_obj_textured(textured_quad)
    verts = m.vertices - [0, 0, m.vertices[:, 2].min() - 0.5]
    cams = build_camera_ring(
        length_z=1.0, ortho_scale_world=6.0, view_num=1,
        elevation_deg=30.0, resolution=(48, 48),
    )
    seg0, rgb0 = render_object_views_textured(cams[0], verts, m)
    seg1, rgb1 = render_object_views_textured(cams[0], verts, m, gi_samples=6)
    assert (seg0 == seg1).all()
    assert rgb1.shape == rgb0.shape
    # indirect adds light: mean cannot drop (uint8 rounding tolerance)
    assert rgb1.astype(int).mean() >= rgb0.astype(int).mean() - 1
