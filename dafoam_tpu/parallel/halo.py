"""Explicit shard_map halo-exchange path for partition-boundary faces.

The reference's MPI domain decomposition handles cross-processor faces via
coupled processor patches inside every fvm/fvc operator and explicit
cross-proc connectivity in DAJacCon (DAJacCon.H:100-109
calcNeiBFaceGlobalCompact / setupStateBoundaryCon); decomposePar builds the
subdomains (pyDAFoam.py:1454-1480). The TPU-native equivalent here:

- cells are relabelled into contiguous per-shard blocks
  (parallel.partition.reorder_for_partitions);
- every cut face is DUPLICATED on both incident shards (the OpenFOAM
  processor-patch trick): the owner shard applies it to the owner row, the
  neighbour shard (ghost copy) applies it to the neighbour row, so after
  one bidirectional halo exchange of cell values every row sum is purely
  local;
- the halo exchange is one `lax.ppermute` per partition-distance present
  in the cut (slab-like partitions: just the ring shift 1) — comm volume
  is proportional to the cut, not the domain;
- AD: shard_map + ppermute are differentiable, so `jax.vjp` of the matvec
  yields the reverse halo pattern automatically (the reference needs a
  differentiated MPI for this, DASolver.C:1810).

Why this exists in addition to the GSPMD path (parallel.shard): XLA:CPU's
SPMD partitioner MISCOMPILES the p-equation assembly when a *computed*
face-sized array is partitioned on the face axis inside the full residual
graph (bisected round 2: every sub-expression in isolation is bit-exact;
a replication constraint on geom.magsf fixes the full graph and a
face-shard constraint reproduces err O(10) — a partitioner/fusion
interaction bug, not a semantics error in these ops). Inside shard_map
there are no partitioner decisions left to get wrong.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class HaloPlan(NamedTuple):
    """Static decomposition plan. Per-shard tables are padded to common
    sizes and stacked with a leading shard axis (sharded when fed to
    shard_map)."""

    n_shards: int
    n_cells: int
    ncl: int                  # cells per shard
    nfl: int                  # owned internal faces per shard (padded)
    ext_size: int             # local cells + all halo buffers
    dists: tuple              # partition distances with cut faces
    # cell halo: FORWARD (owner needs x[nei]): shard q sends x[fsend] to
    # q-d; BACKWARD (ghost/neighbour shard needs x[own]): shard q sends
    # x[bsend] to q+d
    cell_send_fwd: tuple      # per-distance (P, Hf) int32 local cell idx
    cell_send_bwd: tuple      # per-distance (P, Hb) int32
    # face-coeff halo: ghost faces need `lower` of owner-shard faces
    face_send: tuple          # per-distance (P, Fh) int32 local FACE idx
    face_pack: np.ndarray     # (P, nfl) int64 global internal-face id
    # matvec entries: y[row] += coeff_ext[src] * x_ext[col] * valid
    row: np.ndarray           # (P, E) int32
    col: np.ndarray           # (P, E) int32
    src: np.ndarray           # (P, E) int32
    valid: np.ndarray         # (P, E) float64
    cut_faces: int            # total cut faces (comm volume diagnostic)


def _pad_lists(lists, dtype=np.int32):
    H = max(1, max(len(x) for x in lists))
    arr = np.zeros((len(lists), H), dtype=dtype)
    for i, x in enumerate(lists):
        arr[i, : len(x)] = x
    return arr


def build_halo_plan(topo, n_shards: int) -> HaloPlan:
    """Cells must already be relabelled into contiguous partition blocks
    (reorder_for_partitions) with n_cells % n_shards == 0."""
    nc, ni = topo.n_cells, topo.n_internal
    Pn = int(n_shards)
    assert nc % Pn == 0, f"n_cells {nc} not divisible by {Pn} shards"
    ncl = nc // Pn
    part = np.arange(nc) // ncl
    own = topo.owner[:ni].astype(np.int64)
    nei = topo.neighbour.astype(np.int64)
    po, pn = part[own], part[nei]
    assert (po <= pn).all(), "faces must be owner-sorted upper-triangular"
    cut = np.nonzero(po != pn)[0]
    dists = sorted({int(d) for d in np.unique(pn[cut] - po[cut])})

    # ---- per-shard owned-face blocks -----------------------------------
    face_lists = [np.nonzero(po == p)[0] for p in range(Pn)]
    face_pack = _pad_lists(face_lists, np.int64)
    nfl = face_pack.shape[1]
    local_face = {}
    for p, fl in enumerate(face_lists):
        for j, f in enumerate(fl):
            local_face[int(f)] = (p, j)

    # ---- halo send lists + receive positions ----------------------------
    fwd = {d: [[] for _ in range(Pn)] for d in dists}   # sender = nei shard
    bwd = {d: [[] for _ in range(Pn)] for d in dists}   # sender = own shard
    fsd = {d: [[] for _ in range(Pn)] for d in dists}   # face coeff sender
    for f in cut:
        d = int(pn[f] - po[f])
        fwd[d][pn[f]].append(int(nei[f]))
        bwd[d][po[f]].append(int(own[f]))
        fsd[d][po[f]].append(int(f))
    cell_send_fwd, cell_send_bwd, face_send = [], [], []
    fwd_pos, bwd_pos, fcoef_pos = {}, {}, {}
    for d in dists:
        lf = [sorted(set(x)) for x in fwd[d]]
        lb = [sorted(set(x)) for x in bwd[d]]
        lfc = [x for x in fsd[d]]                     # keep face order
        for q in range(Pn):
            for j, c in enumerate(lf[q]):
                fwd_pos[(q - d, c)] = (d, j)          # receiver, global cell
            for j, c in enumerate(lb[q]):
                bwd_pos[(q + d, c)] = (d, j)
            for j, f in enumerate(lfc[q]):
                fcoef_pos[f] = (d, j)                 # receiver = q + d
        cell_send_fwd.append(_pad_lists(
            [[c - q * ncl for c in lf[q]] for q in range(Pn)]))
        cell_send_bwd.append(_pad_lists(
            [[c - q * ncl for c in lb[q]] for q in range(Pn)]))
        face_send.append(_pad_lists(
            [[local_face[f][1] for f in lfc[q]] for q in range(Pn)]))

    # ext cell layout: [local | fwd(d1) | fwd(d2)... | bwd(d1) | bwd(d2)...]
    off = ncl
    fwd_off, bwd_off = {}, {}
    for d, a in zip(dists, cell_send_fwd):
        fwd_off[d] = off
        off += a.shape[1]
    for d, a in zip(dists, cell_send_bwd):
        bwd_off[d] = off
        off += a.shape[1]
    ext_size = off
    # coeff ext layout: [upper_local | lower_local | lower_halo(d1) | ...]
    fcoef_off, off2 = {}, 2 * nfl
    for d, a in zip(dists, face_send):
        fcoef_off[d] = off2
        off2 += a.shape[1]

    # ---- entry table ----------------------------------------------------
    entries = [[] for _ in range(Pn)]   # (row, col_ext, src_coeff)
    for f in range(ni):
        p, j = local_face[f]
        o_l = int(own[f]) - p * ncl
        if po[f] == pn[f]:
            n_l = int(nei[f]) - p * ncl
            entries[p].append((o_l, n_l, j))              # upper * x[nei]
            entries[p].append((n_l, o_l, nfl + j))        # lower * x[own]
        else:
            d = int(pn[f] - po[f])
            q = int(pn[f])
            _, hj = fwd_pos[(p, int(nei[f]))]
            entries[p].append((o_l, fwd_off[d] + hj, j))  # owner row
            n_l = int(nei[f]) - q * ncl                   # ghost copy on q
            _, bj = bwd_pos[(q, int(own[f]))]
            gd, gj = fcoef_pos[int(f)]
            entries[q].append((n_l, bwd_off[d] + bj,
                               fcoef_off[gd] + gj))
    E = max(1, max(len(r) for r in entries))
    row = np.zeros((Pn, E), dtype=np.int32)
    col = np.zeros((Pn, E), dtype=np.int32)
    src = np.zeros((Pn, E), dtype=np.int32)
    valid = np.zeros((Pn, E), dtype=np.float64)
    for p in range(Pn):
        for e, (r, c, s) in enumerate(entries[p]):
            row[p, e], col[p, e], src[p, e], valid[p, e] = r, c, s, 1.0

    return HaloPlan(n_shards=Pn, n_cells=nc, ncl=ncl, nfl=nfl,
                    ext_size=ext_size, dists=tuple(dists),
                    cell_send_fwd=tuple(cell_send_fwd),
                    cell_send_bwd=tuple(cell_send_bwd),
                    face_send=tuple(face_send), face_pack=face_pack,
                    row=row, col=col, src=src, valid=valid,
                    cut_faces=int(len(cut)))


class HaloMatvec:
    """Sharded LDU matvec y = diag*x + offdiag@x through shard_map with
    explicit ppermute halo exchange — the multi-chip hot op of both the
    primal smoothers and the adjoint FGMRES (reference
    dRdWTMatVecMultFunction, DASolver.C:1364, whose MPI halo the
    differentiated Pstream handles).

        hm = HaloMatvec(topo, mesh)         # once per topology/mesh
        y  = hm(diag, lower, upper, x)      # global arrays; y sharded

    Differentiable: jax.vjp/jvp through __call__ transpose the ppermutes
    automatically.
    """

    def __init__(self, topo, mesh: Mesh, axis: str = "mesh"):
        self.mesh, self.axis, self.topo = mesh, axis, topo
        self.plan = build_halo_plan(topo, mesh.devices.size)
        p = self.plan
        sh2 = NamedSharding(mesh, P(axis, None))
        put2 = lambda a: jax.device_put(jnp.asarray(a), sh2)  # noqa: E731
        self._tables = tuple(put2(a) for a in (p.row, p.col, p.src, p.valid))
        self._sends = tuple(put2(a) for a in
                            (*p.cell_send_fwd, *p.cell_send_bwd,
                             *p.face_send))
        self._face_pack = jnp.asarray(p.face_pack)
        self._fn = None

    def _build(self):
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        p = self.plan
        Pn, ncl, nd, ax = p.n_shards, p.ncl, len(p.dists), self.axis

        def local(x_l, d_l, lo_l, up_l, row, col, src, valid, *sends):
            x_l, d_l, lo_l, up_l, row, col, src, valid = (
                a[0] for a in (x_l, d_l, lo_l, up_l, row, col, src, valid))
            sends = [a[0] for a in sends]
            fwd, bwd, fsd = sends[:nd], sends[nd:2 * nd], sends[2 * nd:]
            bufs = []
            for d, sidx in zip(p.dists, fwd):    # x[nei] -> owner shard
                perm = [(q, q - d) for q in range(d, Pn)]
                bufs.append(jax.lax.ppermute(x_l[sidx], ax, perm))
            for d, sidx in zip(p.dists, bwd):    # x[own] -> neighbour shard
                perm = [(q, q + d) for q in range(0, Pn - d)]
                bufs.append(jax.lax.ppermute(x_l[sidx], ax, perm))
            ext = jnp.concatenate([x_l] + bufs) if bufs else x_l
            cbufs = []
            for d, fidx in zip(p.dists, fsd):    # lower -> neighbour shard
                perm = [(q, q + d) for q in range(0, Pn - d)]
                cbufs.append(jax.lax.ppermute(lo_l[fidx], ax, perm))
            coeff = jnp.concatenate([up_l, lo_l] + cbufs)
            w = coeff[src] * valid.astype(x_l.dtype)
            xv = ext[col]
            if xv.ndim > 1:                      # (nc,3) vector fields
                w = w.reshape(w.shape + (1,) * (xv.ndim - 1))
            if d_l.ndim < x_l.ndim:
                d_l = d_l[..., None]
            y = d_l * x_l + jax.ops.segment_sum(w * xv, row,
                                                num_segments=ncl)
            return y[None]

        nargs = 8 + 3 * nd
        sm = shard_map(local, mesh=self.mesh,
                       in_specs=(P(ax),) * nargs, out_specs=P(ax))

        def mv(diag, lower, upper, x):
            lo2 = lower[self._face_pack]
            up2 = upper[self._face_pack]
            extra = x.shape[1:]
            dshape = (Pn, ncl) + diag.shape[1:]
            return sm(x.reshape((Pn, ncl) + extra), diag.reshape(dshape),
                      lo2, up2, *self._tables,
                      *self._sends).reshape((Pn * ncl,) + extra)

        return jax.jit(mv)

    def __call__(self, diag, lower, upper, x):
        if self._fn is None:
            self._fn = self._build()
        return self._fn(diag, lower, upper, x)


# ---------------------------------------------------------------------------
# Activation registry: solvers opt a topology into the explicit-halo path
# (parallel.shard.shard_solver). While active, ops.fvmatrix.matvec_fn/
# matvec route EVERY LDU product — primal smoother iterations, the
# custom_linear_solve transposes, the adjoint FGMRES products — through
# HaloMatvec, so solve-phase communication is explicit ppermutes
# proportional to the partition cut (reference: processor-patch exchanges
# inside every fvMatrix solve; DAJacCon.H:100-109 cross-proc coupling).
# ---------------------------------------------------------------------------

import weakref

_ACTIVE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def activate(topo, mesh: Mesh, axis: str = "mesh") -> "HaloMatvec":
    hm = _ACTIVE.get(topo)
    if hm is None or hm.mesh is not mesh:
        hm = HaloMatvec(topo, mesh, axis)
        _ACTIVE[topo] = hm
    return hm


def active(topo):
    try:
        return _ACTIVE.get(topo)
    except TypeError:  # unhashable/weakref-less stand-ins
        return None


def deactivate(topo):
    _ACTIVE.pop(topo, None)
