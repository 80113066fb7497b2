"""Checkpoint / exact resume.

The reference has none (*Restart is parsed-and-ignored; SURVEY.md §5).  The
full state pytree — displacements, velocity, Gauss-point stress/strain,
plastic state, element flags, step counter — round-trips through one ``.npz``
so a run can resume bit-exactly.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..core.state import SimState


def save_checkpoint(path: str, state: SimState) -> str:
    leaves = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    np.savez_compressed(path, **leaves)
    return path


def load_checkpoint(path: str, like: SimState) -> SimState:
    data = np.load(path)
    kw = {}
    for f in dataclasses.fields(like):
        ref = getattr(like, f.name)
        arr = data[f.name]
        if (f.name == "strain" and arr.ndim == np.ndim(ref) + 1
                and arr.shape[-2] == 8):
            # pre-GP-mean checkpoint: strain was stored per Gauss point
            # (…, 6, 8, E); the state now carries the GP mean (…, 6, E)
            arr = arr.mean(axis=-2)
        if arr.shape != np.shape(ref):
            raise ValueError(
                f"checkpoint field {f.name} has shape {arr.shape}, "
                f"model expects {np.shape(ref)}")
        kw[f.name] = jax.numpy.asarray(arr, np.asarray(ref).dtype)
    return SimState(**kw)
