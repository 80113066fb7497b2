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
        if arr.shape != np.shape(ref):
            raise ValueError(
                f"checkpoint field {f.name} has shape {arr.shape}, "
                f"model expects {np.shape(ref)}")
        kw[f.name] = jax.numpy.asarray(arr, np.asarray(ref).dtype)
    return SimState(**kw)
