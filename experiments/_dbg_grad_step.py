import faulthandler, os
faulthandler.dump_traceback_later(120, exit=True)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.parallel.dist import make_mesh, render_grad_sharded, replicate_scene
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

scene = compile_scene(cornell_box(), cluster_size=128)
cam = cornell_camera(width=32, height=32)
film = Film(width=32, height=32)
integ = PathTracer(max_depth=3, cluster_size=128).specialized_for(scene)
mesh8 = make_mesh(jax.devices()[:8])
mesh1 = make_mesh(jax.devices()[:1])
print("start", flush=True)
loss8, grads8 = render_grad_sharded(replicate_scene(scene, mesh8), cam, film, integ, 1, 0, mesh8)
print("8 done", float(loss8), flush=True)
loss1, grads1 = render_grad_sharded(replicate_scene(scene, mesh1), cam, film, integ, 1, 0, mesh1)
print("1 done", float(loss1), flush=True)
for k in grads8:
    g8, g1 = np.asarray(grads8[k]), np.asarray(grads1[k])
    print(k, np.abs(g8-g1).max())
