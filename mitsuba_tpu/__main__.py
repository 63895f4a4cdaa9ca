"""`python -m mitsuba_tpu` entry point.

Platform selection must happen BEFORE the package import below: importing
mitsuba_tpu creates jnp constants (core/spectrum.py tables), which
instantiates the default JAX backend — after that, jax_platforms updates
are silently ignored. Honoring JAX_PLATFORMS=cpu here lets users render
on CPU even though the image's sitecustomize force-registers a TPU plugin
(same dance as tests/conftest.py).
"""
import os

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from .cli import main  # noqa: E402

raise SystemExit(main())
