"""Gather/scatter primitives: the TPU substrate for unstructured FV.

Every OpenFOAM ``fvm``/``fvc`` operator reduces to (1) gather cell values to
faces, (2) a per-face flux computation, (3) scatter-add face contributions
back to cells. On TPU the scatter is ``jax.ops.segment_sum``; internal faces
are kept sorted by owner (canonical upper-triangular order, see
``mesh.topology``) so the owner-side scatter can use ``indices_are_sorted``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add(vals: jnp.ndarray, cells, n_cells: int, sorted: bool = False):
    """sum_{f: cells[f]==c} vals[f]  ->  (n_cells, ...).

    NOTE: the `indices_are_sorted` hint is deliberately NOT forwarded —
    under GSPMD the hint applies per-shard after partitioning and XLA can
    exploit it incorrectly for face arrays sharded independently of cells,
    silently corrupting the scatter (observed as sharded-primal divergence
    in test_sharding)."""
    return jax.ops.segment_sum(vals, cells, num_segments=n_cells)


def boundary_gather(x: jnp.ndarray, topo):
    """x[owner[ni:]] (cell values at boundary-face owners), patch-aware.

    Identity patches (2-D empty planes) are a plain copy instead of a
    525k-index gather (measured 3.75 ms -> ~0 at 262k cells)."""
    parts = []
    for mode, b0, sz, idx in topo.boundary_scatter_plan():
        if mode == "identity":
            parts.append(x)
        elif mode == "perm":
            # owner of patch-face j is the cell with inv[cell] == j, i.e.
            # x reordered by the forward permutation = owner slice itself
            parts.append(x[jnp.asarray(
                topo.owner[topo.n_internal + b0:topo.n_internal + b0 + sz])])
        else:
            parts.append(x[jnp.asarray(idx)])
    return jnp.concatenate(parts, axis=0)


def boundary_scatter_add(y: jnp.ndarray, vals_b: jnp.ndarray, topo):
    """y[owner[ni:]] += vals_b, patch-aware and TPU-fast.

    Boundary-sized random scatters serialize on TPU (~4.6 ms at 500k
    faces); patches whose owners are a bijection onto the cells (the 2-D
    "empty" planes) are instead folded with an inverse-permutation gather
    (~70 us). See MeshTopology.boundary_scatter_plan."""
    for mode, b0, sz, idx in topo.boundary_scatter_plan():
        v = jax.lax.slice_in_dim(vals_b, b0, b0 + sz, axis=0)
        if mode == "identity":
            y = y + v
        elif mode == "perm":
            y = y + v[jnp.asarray(idx)]
        else:
            y = y.at[jnp.asarray(idx)].add(v)
    return y


# ---------------------------------------------------------------------------
# Gather-form face->cell reductions (the TPU-critical primitives)
#
# TPU scatters serialize per index; every assembly-time face->cell reduction
# here is instead a per-cell GATHER over the <=K incident faces (topo.ell()).
# The custom VJPs keep the BACKWARD pass scatter-free too: the transpose of
# "sum faces into cells" is "broadcast cells onto faces", which is itself a
# gather — so primal, adjoint (vjp) and forward (jvp) sweeps never scatter
# over the big internal-face axis. (Boundary-face scatters remain: the
# boundary is O(surface) small.)
# ---------------------------------------------------------------------------

def _ell_expand(x, extra_ndim):
    return x.reshape(x.shape + (1,) * extra_ndim)


def _face_gather_sum(vals_i, topo, own_w, nei_w):
    """sum_k w(k) * vals_i[face_id[c,k]] with w = own_w on owner slots and
    nei_w on neighbour slots."""
    face_id, col, is_owner, valid = topo.ell()
    v = vals_i[face_id]                           # (nc, K, ...)
    extra = v.ndim - 2
    w = jnp.where(jnp.asarray(is_owner, vals_i.dtype) > 0.5, own_w, nei_w) \
        * jnp.asarray(valid, vals_i.dtype)
    return (v * _ell_expand(w, extra)).sum(axis=1)


from jax.custom_derivatives import linear_call


def _one_sided_sum(vals_i, topo, own_w, nei_w):
    return _face_gather_sum(vals_i, topo, own_w, nei_w)


# ---------------------------------------------------------------------------
# Dense-DIA fast paths (topology.to_dia_dense): internal faces live in an
# offset-major (K, nc) layout, so every cell<->face movement is a broadcast
# or a STATIC SHIFT — zero arbitrary-index gathers. Measured ~10x faster
# per fused assembly op on TPU v5e, where a gather inside a fused loop
# scalarizes (~3 ms vs ~0.4 us for the same bytes at 65k cells).
# ---------------------------------------------------------------------------

def _dd(topo):
    fn = getattr(topo, "dia_dense", None)
    return fn() if fn is not None else None


def _shape_kn(x, topo, K):
    """(K*nc, ...) face array -> (K, nc, ...)"""
    return x.reshape((K, topo.n_cells) + x.shape[1:])


def _shift_fwd(x, o):
    """y[c] = x[c + o] (zeros beyond the end); x (nc, ...)"""
    nc = x.shape[0]
    pad = [(0, o)] + [(0, 0)] * (x.ndim - 1)
    return jax.lax.slice_in_dim(jnp.pad(x, pad), o, o + nc, axis=0)


def _shift_bwd(x, o):
    """y[c] = x[c - o] (zeros before the start)"""
    nc = x.shape[0]
    pad = [(o, 0)] + [(0, 0)] * (x.ndim - 1)
    return jax.lax.slice_in_dim(jnp.pad(x, pad), 0, nc, axis=0)


def face_sum_signed(vals_i, topo):
    """y[c] = sum_{f: own=c} vals_i[f] - sum_{f: nei=c} vals_i[f].

    LINEAR op via linear_call: forward AND transpose (reverse-mode) are
    explicit gather/shift expressions, and forward-mode jvp works too (the
    reference needs three separate AD builds for this trio)."""
    ni = topo.n_internal
    dd = _dd(topo)
    if dd is not None:
        offs, _ = dd
        K = len(offs)

        def f(_, x):
            xk = _shape_kn(x, topo, K)
            y = xk.sum(axis=0)
            for i, o in enumerate(offs):
                y = y - _shift_bwd(xk[i], o)
            return y

        def ft(_, ct):
            return jnp.concatenate(
                [ct - _shift_fwd(ct, o) for o in offs], axis=0)

        return linear_call(f, ft, (), vals_i)

    def f(_, x):
        return _face_gather_sum(x, topo, 1.0, -1.0)

    def ft(_, ct):
        return ct[topo.owner[:ni]] - ct[topo.neighbour]

    return linear_call(f, ft, (), vals_i)


def face_sum_pair(own_vals, nei_vals, topo):
    """y[c] = sum_{f: own=c} own_vals[f] + sum_{f: nei=c} nei_vals[f] —
    the LDU diagonal-assembly reduction (linear, scatter/gather-free both
    ways)."""
    ni = topo.n_internal
    dd = _dd(topo)
    if dd is not None:
        offs, _ = dd
        K = len(offs)

        def f(_, x):
            ok = _shape_kn(x[0], topo, K)
            nk = _shape_kn(x[1], topo, K)
            y = ok.sum(axis=0)
            for i, o in enumerate(offs):
                y = y + _shift_bwd(nk[i], o)
            return y

        def ft(_, ct):
            own_ct = jnp.concatenate([ct] * K, axis=0)
            nei_ct = jnp.concatenate(
                [_shift_fwd(ct, o) for o in offs], axis=0)
            return (own_ct, nei_ct)

        return linear_call(f, ft, (), (own_vals, nei_vals))

    def f(_, x):
        return _one_sided_sum(x[0], topo, 1.0, 0.0) \
            + _one_sided_sum(x[1], topo, 0.0, 1.0)

    def ft(_, ct):
        return (ct[topo.owner[:ni]], ct[topo.neighbour])

    return linear_call(f, ft, (), (own_vals, nei_vals))


def cell_to_face_own(x, topo):
    """x[owner] on internal faces, with a scatter-free transpose (the
    transpose of a cell->face broadcast is a face->cell sum)."""
    ni = topo.n_internal
    dd = _dd(topo)
    if dd is not None:
        offs, _ = dd
        K = len(offs)

        def f(_, v):
            return jnp.concatenate([v] * K, axis=0)

        def ft(_, ct):
            return _shape_kn(ct, topo, K).sum(axis=0)

        return linear_call(f, ft, (), x)

    def f(_, v):
        return v[topo.owner[:ni]]

    def ft(_, ct):
        return _one_sided_sum(ct, topo, 1.0, 0.0)

    return linear_call(f, ft, (), x)


def cell_to_face_nei(x, topo):
    dd = _dd(topo)
    if dd is not None:
        offs, _ = dd
        K = len(offs)

        def f(_, v):
            return jnp.concatenate(
                [_shift_fwd(v, o) for o in offs], axis=0)

        def ft(_, ct):
            ck = _shape_kn(ct, topo, K)
            y = jnp.zeros((topo.n_cells,) + ct.shape[1:], ct.dtype)
            for i, o in enumerate(offs):
                y = y + _shift_bwd(ck[i], o)
            return y

        return linear_call(f, ft, (), x)

    def f(_, v):
        return v[topo.neighbour]

    def ft(_, ct):
        return _one_sided_sum(ct, topo, 0.0, 1.0)

    return linear_call(f, ft, (), x)


def surface_sum(vals_internal, vals_boundary, topo, active_b=None):
    """OpenFOAM surfaceSum: per-cell sum of face values with owner +, nei -.

    ``vals_internal``: (ni, ...) per-internal-face values;
    ``vals_boundary``: (nb, ...) per-boundary-face values (outward sign).
    ``active_b``: optional (nb,) 0/1 mask (0 for empty patches).
    Internal part is gather-form (scatter-free both ways); the small
    boundary part stays a scatter.
    """
    ni = topo.n_internal
    out = face_sum_signed(vals_internal, topo)
    if vals_boundary is not None:
        if active_b is not None:
            shp = (-1,) + (1,) * (vals_boundary.ndim - 1)
            vals_boundary = vals_boundary * active_b.reshape(shp)
        out = boundary_scatter_add(out, vals_boundary, topo)
    return out


def gather_own_nei(psi: jnp.ndarray, topo):
    """Cell field -> (owner values on all faces, neighbour values on internal)."""
    return psi[topo.owner], psi[topo.neighbour]
