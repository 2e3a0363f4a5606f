"""Adjoint state registry and flat-vector layout.

Equivalent of the reference's DAStateInfo + DAIndex + DAField trio
(src/adjoint/DAStateInfo/, DAIndex.H:83-163, DAField.H:78-108): which fields
are adjoint states, and how they map to one flat vector. In JAX the adjoint
machinery works directly on the state *pytree* (no PETSc Vec needed), but the
flat layout is preserved for API parity (getStates/setStates) and for the
GMRES basis, following the reference's documented ordering
(DAField.C ofField2State): volVectorStates (cell-major, 3 comps), then
volScalarStates, then modelStates, then surfaceScalarStates.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class StateInfo:
    vol_vector: tuple[str, ...] = ()
    vol_scalar: tuple[str, ...] = ()
    model: tuple[str, ...] = ()
    surface_scalar: tuple[str, ...] = ()

    @property
    def ordered(self):
        return (tuple((n, "vector") for n in self.vol_vector)
                + tuple((n, "scalar") for n in self.vol_scalar)
                + tuple((n, "model") for n in self.model)
                + tuple((n, "face") for n in self.surface_scalar))

    def names(self):
        return [n for n, _ in self.ordered]


class StateLayout:
    """Pack/unpack between the state dict-pytree and one flat vector.

    ordering="state" (default): the reference's documented state-major
    layout (DAField.C ofField2State; see module docstring).
    ordering="cell": the reference's `adjStateOrdering: cell` variant
    (pyDAFoam.py:608, DAIndex cell ordering) — all cell-based components
    of cell 0, then cell 1, ... (per cell: vector comps, volScalars,
    modelStates), with surfaceScalarStates appended after the cell block
    (face rows have no owning cell slot in a flat vector; the reference
    keys them off owner cells inside DAIndex, which has no analog here).
    """

    def __init__(self, info: StateInfo, n_cells: int, n_faces: int,
                 ordering: str = "state"):
        if ordering not in ("state", "cell"):
            raise ValueError(f"adjStateOrdering must be 'state' or 'cell', "
                             f"got {ordering!r}")
        self.info = info
        self.n_cells = n_cells
        self.n_faces = n_faces
        self.ordering = ordering
        self.sizes = {}
        self.offsets = {}
        off = 0
        for name, kind in info.ordered:
            sz = 3 * n_cells if kind == "vector" else (
                n_faces if kind == "face" else n_cells)
            self.sizes[name] = sz
            self.offsets[name] = off
            off += sz
        self.n_states = off
        if ordering == "cell":
            # state-major offsets are MEANINGLESS under cell ordering
            # (components interleave per cell) — fail loudly on misuse
            # instead of silently slicing wrong positions
            self.offsets = None
        # cell ordering: per-cell component count of the cell-block
        self.cell_comps = sum(3 if kind == "vector" else 1
                              for _, kind in info.ordered if kind != "face")

    def _cell_names(self):
        return [(n, k) for n, k in self.info.ordered if k != "face"]

    def _face_names(self):
        return [(n, k) for n, k in self.info.ordered if k == "face"]

    def pack(self, state: dict) -> jnp.ndarray:
        if self.ordering == "cell":
            cols = []
            for name, kind in self._cell_names():
                v = state[name]
                cols.append(v if kind == "vector" else v[:, None])
            parts = [jnp.concatenate(cols, axis=1).reshape(-1)] if cols \
                else []
            parts += [state[n].reshape(-1) for n, _ in self._face_names()]
            return jnp.concatenate(parts)
        parts = []
        for name, kind in self.info.ordered:
            parts.append(state[name].reshape(-1))
        return jnp.concatenate(parts)

    def unpack(self, vec: jnp.ndarray) -> dict:
        if self.ordering == "cell":
            out = {}
            nc = self.n_cells
            block = vec[:nc * self.cell_comps].reshape(nc, self.cell_comps)
            col = 0
            for name, kind in self._cell_names():
                w = 3 if kind == "vector" else 1
                chunk = block[:, col:col + w]
                out[name] = chunk if kind == "vector" else chunk[:, 0]
                col += w
            off = nc * self.cell_comps
            for name, _ in self._face_names():
                out[name] = vec[off:off + self.n_faces]
                off += self.n_faces
            return out
        out = {}
        for name, kind in self.info.ordered:
            off, sz = self.offsets[name], self.sizes[name]
            chunk = vec[off:off + sz]
            if kind == "vector":
                chunk = chunk.reshape(self.n_cells, 3)
            out[name] = chunk
        return out

    def zeros(self, dtype=jnp.float64) -> dict:
        out = {}
        for name, kind in self.info.ordered:
            if kind == "vector":
                out[name] = jnp.zeros((self.n_cells, 3), dtype)
            elif kind == "face":
                out[name] = jnp.zeros((self.n_faces,), dtype)
            else:
                out[name] = jnp.zeros((self.n_cells,), dtype)
        return out


def scale_tree(state: dict, scales: dict, default=1.0, invert=False):
    """Multiply each state field by its normalizeStates factor (reference
    `normalizeStates` option, applied in DASolver::normalizeGradientVec,
    DASolver.C:2356-2455)."""
    out = {}
    for k, v in state.items():
        s = scales.get(k, default)
        out[k] = v / s if invert else v * s
    return out
