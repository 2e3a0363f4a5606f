"""Checkpoint / resume for states, histories, and optimization snapshots.

The reference piggybacks on OpenFOAM time-directory IO (SURVEY.md §5.4:
every primal writes time folders; the unsteady adjoint re-reads states per
reverse step; renameSolution snapshots per major iteration). TPU-native
equivalent: flat .npz archives of the state pytree (+ optional stacked
time history). Writes are synchronous (arrays are fetched to host first).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if "/" in str(k):
                raise ValueError(
                    f"checkpoint keys must not contain '/': {k!r}")
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path, state, inputs=None, meta=None):
    """Write state (+inputs, +meta) to one .npz archive."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = {"state/" + k: v for k, v in _flatten(state).items()}
    if inputs is not None:
        data.update({"inputs/" + k: v for k, v in _flatten(inputs).items()})
    if meta:
        data["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **data)


def load_checkpoint(path):
    """-> (state, inputs|None, meta|None)."""
    z = np.load(path)
    state_flat, inputs_flat, meta = {}, {}, None
    for k in z.files:
        if k == "__meta__":
            meta = json.loads(bytes(z[k].tobytes()).decode())
        elif k.startswith("state/"):
            state_flat[k[6:]] = z[k]
        elif k.startswith("inputs/"):
            inputs_flat[k[7:]] = z[k]
    return (_unflatten(state_flat),
            _unflatten(inputs_flat) if inputs_flat else None, meta)


def rename_solution(case_dir, iteration):
    """Snapshot the latest checkpoint per major optimization iteration
    (reference PYDAFOAM.renameSolution, pyDAFoam.py:1507)."""
    src = os.path.join(case_dir, "latest.npz")
    dst = os.path.join(case_dir, f"solution_{iteration:04d}.npz")
    if os.path.exists(src):
        import shutil
        shutil.copyfile(src, dst)
    return dst
