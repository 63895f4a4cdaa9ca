"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 — better
than the reference, which had no automated distributed testing).

Note: the environment's sitecustomize force-registers the TPU plugin and
flips jax_platforms; the jax.config.update below overrides it back to CPU
before any backend is instantiated.
"""
import os

# MITSUBA_TPU_TESTS=1 keeps the real TPU backend (for the *_tpu.py tests);
# default runs everything on CPU with 8 virtual devices.
if os.environ.get("MITSUBA_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
