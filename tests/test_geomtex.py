"""Geometry textures: wireframe / vertexcolors / curvature / scale
(ref: src/textures/{wireframe,vertexcolors,curvature,scale}.cpp — here
compile-time bakes, texture/geomtex.py)."""
import os
import textwrap

import numpy as np
import pytest

from mitsuba_tpu.scene.shapes import Mesh, rectangle, sphere
from mitsuba_tpu.texture import geomtex


def _tri_mesh():
    v = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    return Mesh(v, np.array([[0, 1, 2]]))


def _scene_with_texture(img, mesh):
    """Compile a one-shape scene with `img` as the albedo texture."""
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
    desc = SceneDesc()
    tid = desc.add_texture(img)
    desc.add_material(kind="diffuse", albedo_texture=tid)
    desc.add_shape(mesh, material=0)
    return compile_scene(desc)


def test_vertex_color_bake_exact():
    """Bilinear over the 2x2 block must equal barycentric interpolation
    EXACTLY (the v11 = c1+c2-c0 texel cancels the cross term)."""
    import jax.numpy as jnp

    from mitsuba_tpu.texture.texture import eval_texture

    mesh = _tri_mesh()
    cols = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    atlas, mesh2 = geomtex.bake_vertex_colors(mesh, cols)
    scene = _scene_with_texture(atlas, mesh2)

    # interpolated uv for barycentric (w,u,v) = w*uv0 + u*uv1 + v*uv2
    uvs = np.asarray(mesh2.uvs)
    rng = np.random.default_rng(0)
    b = rng.dirichlet((1, 1, 1), size=64)          # random barycentrics
    uv = b @ uvs[:3]
    want = b @ cols
    got = np.asarray(eval_texture(scene, jnp.zeros(64, jnp.int32),
                                  jnp.asarray(uv)))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_vertex_color_bake_many_faces():
    """Blocks must not bleed into each other at the finest level."""
    import jax.numpy as jnp

    from mitsuba_tpu.texture.texture import eval_texture

    mesh = sphere(subdiv_theta=6, subdiv_phi=8)
    rng = np.random.default_rng(1)
    cols = rng.uniform(0.0, 1.0, (len(mesh.vertices), 3))
    atlas, mesh2 = geomtex.bake_vertex_colors(mesh, cols)
    scene = _scene_with_texture(atlas, mesh2)
    f = np.asarray(mesh.faces)
    # corner uv of face k, corner j must return that corner's color
    uvs = np.asarray(mesh2.uvs).reshape(-1, 3, 2)
    for k in (0, 7, len(f) - 1):
        got = np.asarray(eval_texture(
            scene, jnp.zeros(3, jnp.int32), jnp.asarray(uvs[k])))
        assert np.allclose(got, cols[f[k]], atol=1e-5)


def test_wireframe_pattern():
    mesh = rectangle()
    img = geomtex.wireframe_pattern(mesh, interior=(1, 1, 1),
                                    edge=(0, 0, 0), res=128)
    assert img.shape == (128, 128, 3)
    # center of the lower-left barycentric triangle is interior...
    assert img[128 - int(0.25 * 128), int(0.3 * 128), 0] > 0.9
    # ...and points on an edge (u=0 column) are edge-colored
    assert img[64, 0, 0] < 0.1
    de = geomtex.deindex_barycentric(mesh)
    assert len(de.vertices) == 3 * len(mesh.faces)
    assert np.allclose(de.uvs[:3], [[0, 0], [1, 0], [0, 1]])


def test_curvature_signs():
    """Sphere: positive Gaussian curvature everywhere → red ramp
    (curvature.cpp lookupGradient: v>0 → red)."""
    mesh = sphere(subdiv_theta=24, subdiv_phi=48)
    H, K = geomtex.vertex_curvature(mesh)
    # unit sphere: K ≈ 1, H ≈ 1 (discrete, so loose tolerance)
    assert np.median(K) == pytest.approx(1.0, rel=0.2)
    assert np.median(np.abs(H)) == pytest.approx(1.0, rel=0.2)
    cols = geomtex.curvature_colors(mesh, "gaussian", scale=1.0)
    assert (cols[:, 0] > 0.5).mean() > 0.9      # red channel
    assert np.allclose(cols[:, 2], 0.0, atol=1e-6)


def test_scale_fold():
    img = np.full((2, 2, 3), 0.25, np.float32)
    out = geomtex.scale_texture(img, 2.0)
    assert np.allclose(out, 0.5)


def test_xml_geometry_textures(tmp_path):
    """End to end: XML scene with wireframe + scale textures renders."""
    xml = textwrap.dedent("""\
        <scene version="0.5.0">
            <integrator type="direct"/>
            <sensor type="perspective">
                <float name="fov" value="45"/>
                <transform name="toWorld">
                    <lookat origin="0, 0, 4" target="0, 0, 0"
                            up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="32"/>
                    <integer name="height" value="32"/>
                </film>
            </sensor>
            <shape type="rectangle">
                <bsdf type="diffuse">
                    <texture type="wireframe" name="reflectance">
                        <spectrum name="interiorColor" value="0.7"/>
                        <spectrum name="edgeColor" value="0.05"/>
                    </texture>
                </bsdf>
            </shape>
            <shape type="sphere">
                <transform name="toWorld">
                    <translate x="0" y="0" z="1"/>
                </transform>
                <bsdf type="diffuse">
                    <texture type="scale" name="reflectance">
                        <rgb name="value" value="0.4 0.2 0.1"/>
                        <float name="scale" value="2"/>
                    </texture>
                </bsdf>
            </shape>
            <emitter type="constant">
                <spectrum name="radiance" value="1"/>
            </emitter>
        </scene>
    """)
    p = os.path.join(str(tmp_path), "s.xml")
    with open(p, "w") as f:
        f.write(xml)
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.xml import load_xml
    loaded = load_xml(p)
    scene = compile_scene(loaded.desc)
    img = np.asarray(render(scene, loaded.camera, loaded.film,
                            loaded.make_integrator().specialized_for(scene),
                            spp=4, seed=0))
    assert np.isfinite(img).all() and img.max() > 0.0


def test_xml_vertexcolors_ply(tmp_path):
    """PLY with uchar vertex colors → vertexcolors texture → render."""
    ply = textwrap.dedent("""\
        ply
        format ascii 1.0
        element vertex 3
        property float x
        property float y
        property float z
        property uchar red
        property uchar green
        property uchar blue
        element face 1
        property list uchar int vertex_indices
        end_header
        -1 -1 0 255 0 0
        1 -1 0 0 255 0
        0 1 0 0 0 255
        3 0 1 2
    """)
    pf = os.path.join(str(tmp_path), "m.ply")
    with open(pf, "w") as f:
        f.write(ply)
    from mitsuba_tpu.io.ply import load_ply
    m = load_ply(pf)
    assert m.colors is not None
    assert np.allclose(m.colors[0], [1, 0, 0])
    xml = textwrap.dedent(f"""\
        <scene version="0.5.0">
            <integrator type="direct"/>
            <sensor type="perspective">
                <float name="fov" value="45"/>
                <transform name="toWorld">
                    <lookat origin="0, 0, 4" target="0, 0, 0"
                            up="0, 1, 0"/>
                </transform>
                <film type="hdrfilm">
                    <integer name="width" value="24"/>
                    <integer name="height" value="24"/>
                </film>
            </sensor>
            <shape type="ply">
                <string name="filename" value="{pf}"/>
                <bsdf type="diffuse">
                    <texture type="vertexcolors" name="reflectance"/>
                </bsdf>
            </shape>
            <emitter type="constant">
                <spectrum name="radiance" value="1"/>
            </emitter>
        </scene>
    """)
    p = os.path.join(str(tmp_path), "s.xml")
    with open(p, "w") as f:
        f.write(xml)
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.xml import load_xml
    loaded = load_xml(p)
    scene = compile_scene(loaded.desc)
    img = np.asarray(render(scene, loaded.camera, loaded.film,
                            loaded.make_integrator().specialized_for(scene),
                            spp=4, seed=0))
    assert np.isfinite(img).all() and img.max() > 0.0
