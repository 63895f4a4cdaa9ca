"""Checkpoint/resume for renders and differentiable optimization.

The reference has no render-state checkpointing (SURVEY §5 — only partial
image flushes); here the counter-based sampler makes resume trivial: the
full render state is (scene params, accumulated film, samples done, seed),
all pytrees. Saved with orbax (or a numpy fallback) so long optimizations
and progressive renders survive restarts — the TPU-native answer to the
reference's `-r` partial flush + `serialize()` machinery.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, state: dict) -> None:
    """state: arbitrary pytree of arrays + python scalars."""
    flat, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, treedef=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8), **arrays)


def load_checkpoint(path: str, example_state: dict):
    """Restore into the structure of `example_state` (leaf order must
    match the saved pytree)."""
    data = np.load(path, allow_pickle=False)
    flat_ex, treedef = jax.tree.flatten(example_state)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat_ex))]
    return jax.tree.unflatten(treedef, leaves)


class ProgressiveRenderer:
    """Resumable progressive rendering: accumulates spp in chunks, can
    checkpoint after any chunk and resume bit-exactly (the sample counters
    address the stream absolutely, so a resumed render equals an
    uninterrupted one)."""

    def __init__(self, scene, camera, film, integrator, seed: int = 0):
        self.scene = scene
        self.camera = camera
        self.film = film
        self.integrator = integrator
        self.seed = seed
        self.spp_done = 0
        self.accum = None

    def step(self, spp_chunk: int):
        from ..render import render
        img = render(self.scene, self.camera, self.film, self.integrator,
                     spp_chunk, self.seed + self.spp_done)
        w = float(spp_chunk)
        if self.accum is None:
            self.accum = np.asarray(img) * w
        else:
            self.accum = self.accum + np.asarray(img) * w
        self.spp_done += spp_chunk
        return self.image()

    def image(self):
        return self.accum / max(self.spp_done, 1)

    def save(self, path: str):
        save_checkpoint(path, {
            "accum": self.accum, "spp_done": np.int64(self.spp_done),
            "seed": np.int64(self.seed)})

    def load(self, path: str):
        st = load_checkpoint(path, {
            "accum": np.zeros((self.film.height, self.film.width, 3)),
            "spp_done": np.int64(0), "seed": np.int64(0)})
        self.accum = np.asarray(st["accum"])
        self.spp_done = int(st["spp_done"])
        self.seed = int(st["seed"])
