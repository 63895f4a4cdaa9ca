"""Probe: which per-lane dynamic-indexing forms does Mosaic lower on this
TPU runtime?  If any works, in-kernel texture/envmap fetches become
feasible for the megakernel (else they stay XLA-side gathers).

Run on TPU: PYTHONPATH=/root/repo python experiments/_exp_gather_probe.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024
TAB = 512


def probe(name, kernel_body):
    table = jnp.asarray(
        np.random.default_rng(0).standard_normal((TAB, 128)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, TAB, (8, B)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = kernel_body(tab_ref, idx_ref)

    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
        )(table, idx)
        want = np.asarray(table)[np.asarray(idx), 0]
        ok = np.allclose(np.asarray(out), want)
        print(f"{name}: LOWERED, correct={ok}")
    except Exception as e:  # noqa
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")


probe("table[idx, 0] via jnp.take axis=0 (col 0)",
      lambda tab, idx: jnp.take(tab[:, 0], idx[:], axis=0))

probe("tab col gather via one_hot matmul (reference point)",
      lambda tab, idx: jax.lax.dot_general(
          jax.nn.one_hot(idx[:].reshape(-1), TAB, dtype=jnp.float32),
          tab, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)[:, 0].reshape(8, B))


def dyn_gather(tab, idx):
    from jax.experimental.pallas.tpu import lowering  # noqa
    return None


# lax.gather directly
def lax_gather(tab, idx):
    flat = idx[:].reshape(-1)
    g = tab[:, 0][flat]
    return g.reshape(8, B)


probe("tab[:,0][flat_idx] advanced indexing", lax_gather)

# pltpu primitives, if present
for prim in ("dynamic_gather", "gather", "take"):
    fn = getattr(pltpu, prim, None)
    print(f"pltpu.{prim}:", "present" if fn else "absent")

# 2D gather (row select of a [TAB, 128] table per sublane-lane)
probe("full row gather tab[idx] (expect fail)",
      lambda tab, idx: tab[idx[0, :64].reshape(8, 8), 0])
