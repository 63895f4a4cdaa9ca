"""LEADR anisotropic rough diffuse (ref: src/bsdfs/aniso_roughdiffuse.cpp;
here: deterministic unscented quadrature over the Gaussian slope
distribution instead of the reference's 1-sample MC eval)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.bsdf.bsdf import (anisoroughdiffuse_eval,
                                   anisoroughdiffuse_pdf, _leadr_lambda)
from mitsuba_tpu.scene.builder import Material
from mitsuba_tpu.scene import scene as S


def _params(albedo=(0.6, 0.6, 0.6), m0=(0.0, 0.0), m1=(0.5, 0.5, 0.0),
            vis=True):
    m = Material(kind="aniso_roughdiffuse", albedo=albedo, moments0=m0,
                 moments1=m1, sample_visibility=vis)
    _, p, _ = m.compile()
    return jnp.asarray(p)[None, :]


def _dir(theta, phi=0.0):
    return jnp.asarray([[np.sin(theta) * np.cos(phi),
                         np.sin(theta) * np.sin(phi),
                         np.cos(theta)]], jnp.float32)


def test_smooth_limit_is_diffuse():
    """σ→0, zero mean slope: reduces to albedo/π · cosθo."""
    p = _params(m0=(0.0, 0.0), m1=(1e-8, 1e-8, 0.0))
    wi = _dir(0.4)
    for th in (0.1, 0.7, 1.2):
        wo = _dir(th, phi=2.0)
        f = np.asarray(anisoroughdiffuse_eval(p, wi, wo))[0]
        want = 0.6 / np.pi * np.cos(th)
        assert np.allclose(f, want, rtol=2e-3), (f, want)


def test_matches_bruteforce_slope_expectation():
    """Unscented quadrature vs a 200k-sample MC of the reference's
    estimator (aniso_roughdiffuse.cpp eval), same moments/G2."""
    m0 = (0.15, -0.1)
    m1 = (0.15 ** 2 + 0.09, 0.1 ** 2 + 0.04, 0.15 * -0.1 + 0.01)
    p = _params(albedo=(1.0, 1.0, 1.0), m0=m0, m1=m1, vis=True)
    wi = _dir(0.5, 0.3)
    wo = _dir(0.9, 2.4)
    f = np.asarray(anisoroughdiffuse_eval(p, wi, wo))[0, 0]

    # brute force the slope expectation
    mux, muy = m0
    sx2 = m1[0] - mux ** 2
    sy2 = m1[1] - muy ** 2
    cxy = m1[2] - mux * muy
    rng = np.random.default_rng(0)
    L = np.linalg.cholesky([[sx2, cxy], [cxy, sy2]])
    z = rng.standard_normal((200_000, 2))
    s = z @ L.T + [mux, muy]
    wm = np.stack([-s[:, 0], -s[:, 1], np.ones(len(s))], -1)
    wm /= np.linalg.norm(wm, axis=-1, keepdims=True)
    wiv = np.asarray(wi)[0]
    wov = np.asarray(wo)[0]
    di = np.maximum(wm @ wiv, 0.0)
    do = np.maximum(wm @ wov, 0.0)
    lam_i = float(_leadr_lambda(wi, mux, muy, sx2, sy2, cxy)[0])
    lam_o = float(_leadr_lambda(wo, mux, muy, sx2, sy2, cxy)[0])
    g2 = 1.0 / (1.0 + lam_i + lam_o)
    term = np.where((di > 1e-7) & (do > 1e-7),
                    di * do / wm[:, 2] * g2, 0.0)
    mn = np.array([-mux, -muy, 1.0])
    mn /= np.linalg.norm(mn)
    want = (1.0 / np.pi) * mn[2] / (wiv @ mn) * term.mean()
    np.testing.assert_allclose(f, want, rtol=0.1)


def test_pdf_is_cosine():
    p = _params()
    wi = _dir(0.3)
    wo = _dir(0.6)
    pdf = float(anisoroughdiffuse_pdf(p, wi, wo)[0])
    assert abs(pdf - np.cos(0.6) / np.pi) < 1e-6


def test_render_xml(tmp_path):
    import os
    import textwrap
    xml = textwrap.dedent("""\
        <scene version="0.5.0">
            <integrator type="path"><integer name="maxDepth" value="3"/>
            </integrator>
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
            <shape type="rectangle">
                <bsdf type="aniso_roughdiffuse">
                    <rgb name="reflectance" value="0.7 0.5 0.3"/>
                    <spectrum name="moments0" value="10000.1 9999.95 10000"/>
                    <spectrum name="moments1"
                              value="10000.11 10000.05 9999.995"/>
                </bsdf>
            </shape>
            <emitter type="constant">
                <spectrum name="radiance" value="1"/>
            </emitter>
        </scene>
    """)
    pth = os.path.join(str(tmp_path), "s.xml")
    with open(pth, "w") as f:
        f.write(xml)
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.xml import load_xml
    loaded = load_xml(pth)
    m = loaded.desc.materials[
        loaded.desc.shapes[0].material]
    assert m.kind == "aniso_roughdiffuse"
    # offset 1e4 undone on load
    assert np.allclose(m.moments0, (0.1, -0.05), atol=1e-3)
    scene = compile_scene(loaded.desc)
    img = np.asarray(render(scene, loaded.camera, loaded.film,
                            loaded.make_integrator().specialized_for(scene),
                            spp=8, seed=0))
    assert np.isfinite(img).all() and img.max() > 0.0
