"""Checkpoint / exact resume.

The reference has none (*Restart is parsed-and-ignored; SURVEY.md §5).  The
full state pytree — displacements, velocity, Gauss-point stress/strain,
plastic state, element flags, step counter — round-trips through one ``.npz``
so a run can resume bit-exactly.

Resume is bit-exact for same-format checkpoints.  Old-format checkpoints
with per-Gauss-point strain are migrated by taking the GP mean — the
migration itself is exact, but subsequent strain accumulation happens in a
different rounding order than the old per-GP code would have used, so
strain *output* after such a resume can differ from the old code at ulp
level (strain is write-only diagnostic state; nothing else is affected).
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
        if f.name == "work" and f.name not in data:
            # pre-energy-check checkpoint: the cumulative work pair did not
            # exist; resume with zeroed accumulators (the balance residual
            # restarts from the resume point)
            kw[f.name] = jax.numpy.zeros_like(ref)
            continue
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
