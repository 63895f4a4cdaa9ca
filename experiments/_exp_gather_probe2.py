"""Probe 2: which 2D gather forms does Mosaic lower? take_along_axis
variants on [T, L] tables with per-lane indices."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024


def probe(name, tab_shape, idx_shape, idx_max, body, check):
    table = jnp.asarray(np.random.default_rng(0).standard_normal(
        tab_shape), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, idx_max, idx_shape), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = body(tab_ref[:], idx_ref[:])

    try:
        out_shape = jax.eval_shape(body, table, idx)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape.shape, jnp.float32),
        )(table, idx)
        ok = np.allclose(np.asarray(out), check(np.asarray(table),
                                                np.asarray(idx)))
        print(f"{name}: LOWERED correct={ok}")
        return ok
    except Exception as e:  # noqa
        msg = str(e).split("\n")[0][:110]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


# per-lane row select from a [T, 128] table, T varying
for T in (8, 64, 512, 4096):
    probe(f"take_along_axis axis=0 [T={T},128] idx[8,128]",
          (T, 128), (8, 128), T,
          lambda tab, idx: jnp.take_along_axis(tab, idx, axis=0),
          lambda tab, idx: np.take_along_axis(tab, idx, axis=0))

# along lanes (axis=1): permute within a row
probe("take_along_axis axis=1 [8,1024] idx[8,1024]",
      (8, 1024), (8, 1024), 1024,
      lambda tab, idx: jnp.take_along_axis(tab, idx, axis=1),
      lambda tab, idx: np.take_along_axis(tab, idx, axis=1))

# wider lane count on table
probe("take_along_axis axis=0 [512,B] idx[8,B]",
      (512, B), (8, B), 512,
      lambda tab, idx: jnp.take_along_axis(tab, idx, axis=0),
      lambda tab, idx: np.take_along_axis(tab, idx, axis=0))
