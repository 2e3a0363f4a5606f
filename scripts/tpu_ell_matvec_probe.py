"""Measure the UNSTRUCTURED (gather-form) LDU matvec on the chip.

VERDICT r2 item 4c: the banded (DIA) fast path only exists for meshes
whose renumbering yields few distinct diagonals; a general polyMesh falls
back to gather/scatter (ops/fvmatrix.offdiag_matvec: two cell->face
gathers + one face->cell segment-sum composed of gathers), whose at-scale
TPU cost was unmeasured. This times, at PROBE_N cells (default 262144,
~6 faces/cell):

  dia     banded matvec (XLA shifts)         — the structured baseline
  dia_pk  banded matvec (Pallas VMEM kernel) — the structured fast path
  ell     gather-form matvec on a PERMUTED banded mesh (same operator,
          randomized cell numbering, so only the ACCESS PATTERN differs)

and reports us/matvec and effective GB/s. If ell lands within ~2-3x of
dia, unstructured meshes ride the XLA gather path; a 10x+ gap argues for
an RCM-renumber-to-DIA preprocessing pass (mesh/topology.dia already
covers banded-after-renumbering) or a Pallas ELL kernel.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from dafoam_tpu.mesh import box_hex_mesh
    from dafoam_tpu.mesh.topology import apply_cell_permutation, to_dia_dense
    from dafoam_tpu.ops.fvmatrix import FvMatrix, matvec, matvec_fn

    n_side = int(os.environ.get("PROBE_SIDE", "512"))
    iters = int(os.environ.get("PROBE_ITERS", "100"))
    pts, topo = box_hex_mesh(n_side, n_side, 1, (1.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    dense = to_dia_dense(topo)
    nc, ni = topo.n_cells, topo.n_internal
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    low = jax.random.normal(k1, (ni,), jnp.float32)
    up = jax.random.normal(k2, (ni,), jnp.float32)
    diag = jax.random.normal(k3, (nc,), jnp.float32) + 8.0
    x = jax.random.normal(k4, (nc,), jnp.float32)

    res = {"platform": jax.devices()[0].platform, "cells": nc,
           "faces": ni, "iters": iters}

    def timed(name, f, *args):
        g = jax.jit(f)
        out = g(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = g(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        byt = 4 * (nc * 3 + ni * 2)   # x+y+diag + lower+upper
        res[name + "_us"] = round(dt * 1e6, 2)
        res[name + "_GBps"] = round(byt / dt / 1e9, 1)
        return out

    def loop(mv, x0):
        def body(c, _):
            return mv(c) * 0.25 + x0, ()
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        return y

    # structured baselines on the dense layout
    if dense is not None:
        fm = np.asarray(dense.face_map_old2new[:ni])
        nfd = dense.n_internal
        lo_d = jnp.zeros((nfd,), jnp.float32).at[fm].set(low)
        up_d = jnp.zeros((nfd,), jnp.float32).at[fm].set(up)
        md = FvMatrix(diag=diag, lower=lo_d, upper=up_d,
                      source=jnp.zeros((nc,), jnp.float32))
        timed("dia", lambda xx: loop(matvec_fn(md, dense, pallas=False), xx), x)
        timed("dia_pk", lambda xx: loop(matvec_fn(md, dense), xx), x)

    # gather form on the CANONICAL (non-dense) topology
    m0 = FvMatrix(diag=diag, lower=low, upper=up,
                  source=jnp.zeros((nc,), jnp.float32))
    timed("gather_banded",
          lambda xx: loop(lambda v: matvec(m0, v, topo), xx), x)

    # a RANDOM cell permutation destroys bandedness, leaving the honest
    # unstructured gather pattern (timing only — fresh coefficients, same
    # shapes/sparsity)
    rng = np.random.default_rng(1)
    perm = rng.permutation(nc).astype(np.int64)
    topo_p = apply_cell_permutation(topo, perm)
    m_p = FvMatrix(diag=diag, lower=low, upper=up,
                   source=jnp.zeros((nc,), jnp.float32))
    timed("ell_random",
          lambda xx: loop(lambda v: matvec(m_p, v, topo_p), xx), x)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
