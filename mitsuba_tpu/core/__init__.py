"""mitsuba_tpu.core — foundation layer (libcore analog, SURVEY.md §2.1).

Math/frames/warps/spectrum/RNG/distributions/fresnel/microfacet. Pure JAX +
numpy; device code is functional and wavefront-batched.
"""
from . import distribution, fresnel, math, microfacet, rng, spectrum, transform, warp

__all__ = [
    "math", "rng", "warp", "spectrum", "fresnel", "microfacet",
    "distribution", "transform",
]
