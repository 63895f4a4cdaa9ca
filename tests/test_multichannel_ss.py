"""Multichannel integrator + singlescatter subsurface tests
(ref: src/integrators/misc/multichannel.cpp, src/subsurface/singlescatter.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import transform as tfm
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.misc import FieldIntegrator
from mitsuba_tpu.integrator.multichannel import (MultiChannelIntegrator,
                                                 write_multichannel_exr)
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.integrator.singlescatter import SingleScatterIntegrator
from mitsuba_tpu.render import render
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

RES = 24


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box()), cornell_camera(RES, RES)


def test_multichannel_matches_children(cornell):
    scene, cam = cornell
    film = Film(width=RES, height=RES)
    children = (PathTracer(max_depth=3), FieldIntegrator(field="shNormal"),
                FieldIntegrator(field="distance"))
    mc = MultiChannelIntegrator(children=children,
                                names=("color", "normal", "distance"))
    img = np.asarray(mc.render(scene, cam, film, spp=2, seed=0))
    assert img.shape == (RES, RES, 9)
    assert np.isfinite(img).all()
    # children share the pixel-jitter stream, so each channel group must
    # equal the child rendered standalone with the same seed
    for i, child in enumerate(children):
        solo = np.asarray(render(scene, cam, film, child, spp=2, seed=0))
        np.testing.assert_allclose(img[:, :, 3 * i:3 * i + 3], solo,
                                   rtol=1e-4, atol=1e-5)


def test_multichannel_exr_roundtrip(tmp_path, cornell):
    from mitsuba_tpu.io.image import read_exr
    scene, cam = cornell
    film = Film(width=RES, height=RES)
    mc = MultiChannelIntegrator(
        children=(PathTracer(max_depth=2),
                  FieldIntegrator(field="shNormal")),
        names=("color", "normal"))
    img = mc.render(scene, cam, film, spp=1, seed=0)
    path = str(tmp_path / "mc.exr")
    write_multichannel_exr(path, img, mc.channel_names())
    back = read_exr(path)
    assert back.shape == (RES, RES, 6)
    # EXR stores channels alphabetically; total content must round-trip
    np.testing.assert_allclose(np.sort(back.ravel()),
                               np.sort(np.asarray(img, np.float32).ravel()),
                               rtol=1e-6)


def test_multichannel_xml(tmp_path):
    from mitsuba_tpu.scene.xml import load_xml
    xml = """<scene version="0.5.0">
      <integrator type="multichannel">
        <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
        <integrator type="field"><string name="field" value="shNormal"/></integrator>
      </integrator>
      <sensor type="perspective"/>
    </scene>"""
    p = tmp_path / "mc.xml"
    p.write_text(xml)
    loaded = load_xml(str(p))
    integ = loaded.make_integrator()
    assert isinstance(integ, MultiChannelIntegrator)
    assert len(integ.children) == 2
    assert integ.children[0].max_depth == 3
    assert integ.names == ("path", "shNormal")
    assert integ.channel_names()[3:] == ["shNormal.R", "shNormal.G",
                                         "shNormal.B"]


@pytest.fixture(scope="module")
def translucent():
    desc = cornell_box()
    mat = desc.add_material(kind="diffuse", albedo=(0.0, 0.0, 0.0))
    # floating mid-air in the free region between the two boxes (the
    # preset box spans [0,1]³ with the floor at y=0 — a sphere below
    # y=0 would be outside the box and never visible)
    desc.add_shape(shapes.sphere(10, 20),
                   to_world=tfm.translate([0.32, 0.5, 0.62])
                   @ tfm.scale([0.16] * 3), material=mat)
    return compile_scene(desc), cornell_camera(RES, RES), mat


def _li_grid(integ, scene, cam, seed=0):
    px = jnp.arange(RES * RES, dtype=jnp.uint32)
    pos = jnp.stack([(px % RES) + 0.5, (px // RES) + 0.5],
                    axis=-1).astype(jnp.float32)
    o, d = cam.sample_ray(pos)
    return integ.li(scene, o, d, jnp.uint32(seed), px, 0), px


def test_singlescatter_adds_energy(translucent):
    scene, cam, mat = translucent
    kw = dict(target_mat=mat, sigma_s=(3.0, 3.5, 4.0),
              sigma_a=(0.01, 0.02, 0.04), eta=1.33, max_depth=3)
    ss = SingleScatterIntegrator(**kw)
    base = PathTracer(max_depth=3)
    l_ss, px = _li_grid(ss, scene, cam)
    l_base, _ = _li_grid(base, scene, cam)
    l_ss, l_base = np.asarray(l_ss), np.asarray(l_base)
    assert np.isfinite(l_ss).all()
    # black-albedo sphere: the subsurface term must add energy on the
    # sphere pixels, and nothing anywhere must be lost
    added = (l_ss - l_base).sum(-1)
    assert added.max() > 1e-4
    assert added.min() >= -1e-5


def test_singlescatter_terms_scale(translucent):
    """More internal-reflection depth / transmittance can only add
    (non-negative weights at every masked lane)."""
    scene, cam, mat = translucent
    kw = dict(target_mat=mat, sigma_s=(3.0, 3.5, 4.0),
              sigma_a=(0.01, 0.02, 0.04), eta=1.33, max_depth=2,
              reflection=False, transmittance=False)
    l1, _ = _li_grid(SingleScatterIntegrator(ss_depth=1, **kw), scene, cam)
    l2, _ = _li_grid(SingleScatterIntegrator(ss_depth=2, **kw), scene, cam)
    diff = np.asarray(l2) - np.asarray(l1)
    assert diff.min() >= -1e-6           # monotone in depth
    assert np.isfinite(diff).all()


def test_wiwo_fields():
    """baseFrameWiWo analog: wiMacro/woMacro AOVs in the local frame
    (ref: src/integrators/path/baseFrameWiWo.cpp)."""
    from mitsuba_tpu.integrator.misc import FieldIntegrator
    scene = compile_scene(cornell_box())
    cam = cornell_camera(RES, RES)
    l_wi, _ = _li_grid(FieldIntegrator(field="wiMacro"), scene, cam)
    l_wo, _ = _li_grid(FieldIntegrator(field="woMacro"), scene, cam)
    l_wi, l_wo = np.asarray(l_wi), np.asarray(l_wo)
    assert np.isfinite(l_wi).all() and np.isfinite(l_wo).all()
    # view direction in the local frame has cosθ > 0 on front-facing hits
    nz = np.abs(l_wi).sum(-1) > 0
    assert nz.any()
    assert (l_wi[nz][:, 2] > 0).mean() > 0.95
    # unit length where valid
    assert np.allclose(np.linalg.norm(l_wi[nz], axis=-1), 1.0, atol=1e-4)
    nzo = np.abs(l_wo).sum(-1) > 0
    assert np.allclose(np.linalg.norm(l_wo[nzo], axis=-1), 1.0, atol=1e-4)


def test_baseframe_wiwo_xml(tmp_path):
    import os
    import textwrap
    xml = textwrap.dedent("""\
        <scene version="0.5.0">
            <integrator type="baseFrameWiWo"/>
            <sensor type="perspective">
                <float name="fov" value="40"/>
                <film type="hdrfilm">
                    <integer name="width" value="8"/>
                    <integer name="height" value="8"/>
                </film>
            </sensor>
            <shape type="rectangle"/>
            <emitter type="constant"><spectrum name="radiance" value="1"/>
            </emitter>
        </scene>
    """)
    p = os.path.join(str(tmp_path), "s.xml")
    with open(p, "w") as f:
        f.write(xml)
    from mitsuba_tpu.scene.xml import load_xml
    integ = load_xml(p).make_integrator()
    assert integ.names == ("radiance", "wiMacro", "woMacro")


def test_info_xml(tmp_path):
    """info integrator maps onto field AOVs (ref: info/info.cpp)."""
    import os
    xml = """<scene version="0.5.0">
      <integrator type="info">
        <string name="infoName" value="distance"/>
      </integrator>
      <sensor type="perspective"/>
    </scene>"""
    p = os.path.join(str(tmp_path), "i.xml")
    with open(p, "w") as f:
        f.write(xml)
    from mitsuba_tpu.scene.xml import load_xml
    integ = load_xml(p).make_integrator()
    assert isinstance(integ, FieldIntegrator)
    assert integ.field == "distance"
