"""Mitsuba-XML loader tests: a reference-style Cornell scene renders."""
import numpy as np

from mitsuba_tpu.render import render
from mitsuba_tpu.scene.xml import load_xml

CORNELL_XML = """<?xml version="1.0"?>
<scene version="0.5.0">
  <default name="spp" value="8"/>
  <integrator type="path">
    <integer name="maxDepth" value="4"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="39"/>
    <transform name="toWorld">
      <lookat origin="0.5, 0.5, 2.45" target="0.5, 0.5, 0" up="0, 1, 0"/>
    </transform>
    <film type="hdrfilm">
      <integer name="width" value="32"/>
      <integer name="height" value="32"/>
      <rfilter type="tent"/>
    </film>
    <sampler type="ldsampler">
      <integer name="sampleCount" value="$spp"/>
    </sampler>
  </sensor>

  <bsdf type="diffuse" id="white">
    <rgb name="reflectance" value="0.725 0.71 0.68"/>
  </bsdf>
  <bsdf type="diffuse" id="red">
    <rgb name="reflectance" value="0.63 0.065 0.05"/>
  </bsdf>

  <shape type="rectangle">  <!-- floor -->
    <transform name="toWorld">
      <scale x="0.5" y="0.5" z="1"/>
      <rotate x="1" angle="-90"/>
      <translate x="0.5" y="0" z="0.5"/>
    </transform>
    <ref id="white"/>
  </shape>
  <shape type="rectangle">  <!-- back wall -->
    <transform name="toWorld">
      <scale x="0.5" y="0.5" z="1"/>
      <translate x="0.5" y="0.5" z="0"/>
    </transform>
    <ref id="white"/>
  </shape>
  <shape type="rectangle">  <!-- left wall (red) -->
    <transform name="toWorld">
      <scale x="0.5" y="0.5" z="1"/>
      <rotate y="1" angle="90"/>
      <translate x="0" y="0.5" z="0.5"/>
    </transform>
    <ref id="red"/>
  </shape>
  <shape type="sphere">
    <point name="center" x="0.5" y="0.25" z="0.4"/>
    <float name="radius" value="0.2"/>
    <bsdf type="roughconductor">
      <float name="alpha" value="0.2"/>
    </bsdf>
  </shape>
  <shape type="rectangle">  <!-- light -->
    <transform name="toWorld">
      <scale x="0.15" y="0.15" z="1"/>
      <rotate x="1" angle="90"/>
      <translate x="0.5" y="0.99" z="0.45"/>
    </transform>
    <ref id="white"/>
    <emitter type="area">
      <rgb name="radiance" value="15 13 8"/>
    </emitter>
  </shape>
</scene>
"""


def test_load_and_render(tmp_path):
    p = tmp_path / "cornell.xml"
    p.write_text(CORNELL_XML)
    loaded = load_xml(str(p))
    assert loaded.film.width == 32
    assert loaded.film.filter_name == "tent"
    assert loaded.integrator_config["max_depth"] == 4
    assert loaded.sampler == "ldsampler"
    assert loaded.spp == 8

    scene = loaded.compile(cluster_size=128)
    assert int((np.asarray(scene.tri_area) > 0).sum()) > 100  # sphere tess
    integ = loaded.make_integrator()
    img = np.asarray(render(scene, loaded.camera, loaded.film, integ,
                            spp=4, seed=0))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01   # light reaches the film
    # left third redder than right third (red wall bleeding)
    left = img[:, :10].mean(axis=(0, 1))
    assert left[0] > left[2]


def test_param_substitution(tmp_path):
    xml = """<scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="$depth"/>
      </integrator>
    </scene>"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    loaded = load_xml(str(p), parameters={"depth": 7})
    assert loaded.integrator_config["max_depth"] == 7


def test_include_and_alias(tmp_path):
    """<include> splices a child document; <alias> second-names a BSDF
    (ref: scenehandler.cpp include/alias handling)."""
    (tmp_path / "mats.xml").write_text("""<scene version="0.5.0">
      <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.7 0.7 0.7"/>
      </bsdf>
      <alias id="white" as="wall"/>
    </scene>""")
    (tmp_path / "main.xml").write_text("""<scene version="0.5.0">
      <include filename="mats.xml"/>
      <shape type="rectangle"><ref id="wall"/></shape>
    </scene>""")
    loaded = load_xml(str(tmp_path / "main.xml"))
    assert len(loaded.desc.shapes) == 1
    scene = loaded.compile(cluster_size=64)
    assert int((np.asarray(scene.tri_area) > 0).sum()) == 2


def test_version_upgrade(tmp_path):
    """Pre-0.5 documents (camera/luminaire vocabulary) load via the
    upgrade shim (ref: data/schema/upgrade_0.4.0.xsl)."""
    (tmp_path / "old.xml").write_text("""<scene version="0.4.0">
      <camera type="perspective">
        <float name="fov" value="45"/>
        <film type="exrfilm">
          <integer name="width" value="16"/>
          <integer name="height" value="16"/>
        </film>
      </camera>
      <bsdf type="lambertian" id="w">
        <rgb name="diffuseReflectance" value="0.5 0.5 0.5"/>
      </bsdf>
      <shape type="rectangle">
        <ref id="w"/>
        <luminaire type="area">
          <rgb name="intensity" value="3 3 3"/>
        </luminaire>
      </shape>
    </scene>""")
    loaded = load_xml(str(tmp_path / "old.xml"))
    assert loaded.film.width == 16
    assert len(loaded.desc.shapes) == 1
    m = loaded.desc.materials[loaded.desc.shapes[0].material]
    assert abs(m.albedo[0] - 0.5) < 1e-6
    scene = loaded.compile(cluster_size=64)
    assert scene.n_emitters >= 1
