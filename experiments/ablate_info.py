import numpy as np
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box
from mitsuba_tpu.accel.megakernel import build_mega_tables
scene = compile_scene(cornell_box(), cluster_size=64)
t = build_mega_tables(scene)
print("tc", t.tc, "clusters", t.woop.shape[0], "smooth", t.smooth,
      "n_tris", t.n_tris, "m_real", t.m_real, "et_real", t.et_real,
      "em_count", t.em_count)
