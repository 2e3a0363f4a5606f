"""FvMatrix: the LDU sparse matrix of one implicit FV equation, in JAX.

Equivalent of OpenFOAM's ``fvMatrix``/``lduMatrix``, which the reference's
residual functions are built from (src/adjoint/DAResidual/*). Storage is
face-based:

    diag   (nc,) or (nc,3)   diagonal (boundary internalCoeffs folded in)
    lower  (ni,)             coeff of OWNER in NEIGHBOUR's row
    upper  (ni,)             coeff of NEIGHBOUR in OWNER's row
    source (nc,) or (nc,3)   RHS b (boundaryCoeffs folded in)

Conventions match OpenFOAM exactly so the SIMPLE machinery (A(), H(),
relax(), flux()) carries over:
  -  M @ psi is the volume-INTEGRATED operator;
  -  ``residual`` = (M@psi - b)/V, matching ``UEqn & U`` per-volume semantics
     (dimension check: URes is m/s^2 in DAResidualSimpleFoam.C:27);
  -  A() = cmptAv(diag)/V;  H(psi) = (b - offdiag@psi - (diag-cmptAv)psi)/V
     so that A*psi - H == residual identically (what SIMPLE requires).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dafoam_tpu.ops.core import scatter_add


class FvMatrix(NamedTuple):
    diag: jnp.ndarray
    lower: jnp.ndarray
    upper: jnp.ndarray
    source: jnp.ndarray

    def __add__(self, other):
        if isinstance(other, FvMatrix):
            return FvMatrix(_bc_add(self.diag, other.diag),
                            self.lower + other.lower,
                            self.upper + other.upper,
                            _bc_add(self.source, other.source))
        # adding an explicit cell field F means: M == -F moves to source? No:
        # OpenFOAM `fvm::X - expl` treats expl as part of the equation LHS,
        # i.e. subtracts the volume-integrated field from the source is wrong;
        # keep explicit handling in callers for clarity.
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, FvMatrix):
            return FvMatrix(_bc_add(self.diag, -other.diag),
                            self.lower - other.lower,
                            self.upper - other.upper,
                            _bc_add(self.source, -other.source))
        return NotImplemented

    def __neg__(self):
        return FvMatrix(-self.diag, -self.lower, -self.upper, -self.source)

    # ---- explicit contributions ---------------------------------------
    def add_source(self, field_times_vol: jnp.ndarray) -> "FvMatrix":
        """Add an explicit source term S (per-volume) * V to the RHS:
        equation ``fvm::ops == S`` or ``fvm::ops - S`` on the LHS."""
        return self._replace(source=_bc_add(self.source, field_times_vol))


def _bc_add(a, b):
    """Add with rank broadcasting: (nc,) + (nc,3) -> (nc,3)."""
    if a.ndim == b.ndim:
        return a + b
    if a.ndim < b.ndim:
        return a[..., None] + b
    return a + b[..., None]


def _face_term(coef, psi_vals):
    """coef (ni,) times psi values (ni,) or (ni,3)."""
    if psi_vals.ndim == 2:
        return coef[:, None] * psi_vals
    return coef * psi_vals


def offdiag_matvec(m: FvMatrix, psi: jnp.ndarray, topo) -> jnp.ndarray:
    """Off-diagonal LDU product, scatter-free in EVERY AD mode.

    TPU-first: scatter-adds serialize on the VPU. The product is composed
    from linear primitives with explicit gather transposes
    (ops.core.cell_to_face_* / face_sum_pair), so the primal evaluation,
    the adjoint transposed product (reverse of this op is the matvec of
    the transposed matrix), and forward-mode all lower to gathers only."""
    from dafoam_tpu.ops.core import (cell_to_face_nei, cell_to_face_own,
                                     face_sum_pair)
    pn = cell_to_face_nei(psi, topo)
    po = cell_to_face_own(psi, topo)
    return face_sum_pair(_face_term(m.upper, pn), _face_term(m.lower, po),
                         topo)


def _active_halo(topo):
    """Explicit shard_map+ppermute halo path, when the topology was opted
    in via parallel.shard.shard_solver (multi-chip production route)."""
    try:
        from dafoam_tpu.parallel import halo as _halo
        return _halo.active(topo)
    except Exception:
        return None


def matvec(m: FvMatrix, psi: jnp.ndarray, topo) -> jnp.ndarray:
    """Volume-integrated A @ psi."""
    hm = _active_halo(topo)
    if hm is not None:
        return hm(m.diag, m.lower, m.upper, psi)
    d = m.diag if m.diag.ndim == psi.ndim else m.diag[..., None]
    return d * psi + offdiag_matvec(m, psi, topo)


# trace-scoped Pallas kill switch: the Pallas DIA kernel is custom_vjp-
# wrapped (reverse-AD only); code paths traced under FORWARD-mode AD
# (jvp/linearize — e.g. forward_total_derivative_fp's tangent of the
# whole step map) must build jvp-capable XLA matvecs instead
_NO_PALLAS: list = []


class no_pallas:
    """Context manager: force matvec_fn(pallas=False) for closures built
    while tracing (forward-mode-AD regions)."""

    def __enter__(self):
        _NO_PALLAS.append(True)
        return self

    def __exit__(self, *a):
        _NO_PALLAS.pop()
        return False


def matvec_fn(m: FvMatrix, topo, pallas: bool = True,
              component_major: bool = False):
    """Return a matvec closure with the coefficient layout precomputed.

    Preferred inside Krylov loops: when the renumbered mesh is banded
    (topo.dia()), the per-offset coefficients are gathered ONCE here and
    each application is diag*x + sum_o coef_o * shift(x, o) — static
    slices and multiplies only, the TPU-optimal SpMV. Falls back to the
    ELL gather form otherwise.

    pallas=True (default) routes the scalar banded case through the
    Pallas VMEM-resident kernel on TPU, wrapped in a custom-vjp so
    REVERSE AD through Krylov/smoother loops works (fixed-point adjoint
    step maps, unsteady reverse scans). Two contexts must pass
    pallas=False: (a) operators handed to lax.custom_linear_solve, which
    eagerly LINEAR-TRANSPOSES the closure (custom_vjp calls are not
    transposable — observed as jax hijax 'must override' on the axon TPU
    plugin), and (b) anything forward-mode differentiated (custom_vjp
    blocks jvp).

    component_major=True returns a closure over (C, n) operands with the
    SHARED scalar bands (vector equations, e.g. momentum): the TPU-native
    Krylov layout — (nc,3) occupies 3 of 128 VPU lanes and lane-pads every
    HBM tile; (C,nc) keeps full lanes. Callers (fvsolve.solve) transpose
    once at solve entry/exit. Only available on the banded (dia) path
    with scalar coefficients; never combined with the halo route.
    """
    hm = _active_halo(topo)
    if hm is not None:
        # multi-chip route: every Krylov inner iteration is one shard_map
        # halo matvec (comm = ppermutes proportional to the partition cut)
        assert not component_major
        return lambda x: hm(m.diag, m.lower, m.upper, x)
    dia = topo.dia()
    if dia is None:
        assert not component_major
        return lambda x: matvec(m, x, topo)
    offsets, face_idx, kind = dia
    nc = topo.n_cells
    dd = getattr(topo, "dia_dense", lambda: None)()
    if dd is not None:
        # dense layout: the coefficient "gather" is a reshape + shifts
        from dafoam_tpu.ops.core import _shift_bwd
        offs_d, _ = dd
        up_k = m.upper.reshape(len(offs_d), nc)
        lo_k = m.lower.reshape(len(offs_d), nc)
        pos = {int(o): i for i, o in enumerate(offs_d)}
        rows = []
        for o in offsets.tolist():
            if o > 0:
                rows.append(up_k[pos[o]])
            else:
                rows.append(_shift_bwd(lo_k[pos[-o]], -o))
        coef = jnp.stack(rows)
    else:
        kindj = jnp.asarray(kind)
        coef = jnp.where(kindj == 1, m.upper[face_idx],
                         jnp.where(kindj == 2, m.lower[face_idx], 0.0))
    # pad so every shift is a static slice
    lo = int(max(0, -offsets.min())) if offsets.size else 0
    hi = int(max(0, offsets.max())) if offsets.size else 0
    d0 = m.diag

    # TPU fast path: VMEM-resident Pallas banded matvec (one HBM read per
    # operand instead of one per band — see ops/pallas_kernels.py)
    from dafoam_tpu.ops import pallas_kernels as pk
    offs_t = tuple(int(o) for o in offsets.tolist())
    on_tpu = pk.HAVE_PALLAS and jax.default_backend() == "tpu"
    use_pallas = pallas and not _NO_PALLAS and d0.ndim == 1 and on_tpu \
        and d0.dtype in (jnp.float32, jnp.dtype("float32"))

    if component_major:
        assert d0.ndim == 1, "component-major needs scalar bands"

        def mv_t(x):  # x (C, n)
            if use_pallas and x.dtype == d0.dtype:
                return pk.dia_matvec_multi_ad(d0, coef, offs_t, x)
            y = d0[None, :] * x
            xp = jnp.pad(x, ((0, 0), (lo, hi)))
            for i, o in enumerate(offsets.tolist()):
                y = y + coef[i][None, :] * jax.lax.slice_in_dim(
                    xp, lo + o, lo + o + nc, axis=1)
            return y

        return mv_t

    def mv(x):
        if use_pallas and x.ndim == 1 and x.dtype == d0.dtype:
            return pk.dia_matvec_ad(d0, coef, offs_t, x)
        d = d0 if d0.ndim == x.ndim else d0[..., None]
        y = d * x
        pad = [(lo, hi)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad)
        for i, o in enumerate(offsets.tolist()):
            c = coef[i] if x.ndim == 1 else coef[i][:, None]
            y = y + c * jax.lax.slice_in_dim(xp, lo + o, lo + o + nc, axis=0)
        return y

    return mv


def residual(m: FvMatrix, psi: jnp.ndarray, geom, topo) -> jnp.ndarray:
    """(A psi - b)/V — OpenFOAM ``M & psi`` semantics."""
    r = matvec(m, psi, topo) - _match_rank(m.source, psi)
    v = geom.vol if psi.ndim == 1 else geom.vol[:, None]
    return r / v


def _match_rank(a, like):
    return a if a.ndim == like.ndim else a[..., None]


def cmpt_av(diag: jnp.ndarray) -> jnp.ndarray:
    return diag if diag.ndim == 1 else diag.mean(axis=-1)


def A(m: FvMatrix, geom) -> jnp.ndarray:
    """Central coefficient / volume (volScalarField), OpenFOAM fvMatrix::A."""
    return cmpt_av(m.diag) / geom.vol


def H(m: FvMatrix, psi: jnp.ndarray, geom, topo) -> jnp.ndarray:
    """OpenFOAM fvMatrix::H — defined here such that A*psi - H == residual."""
    av = cmpt_av(m.diag)
    d = m.diag if m.diag.ndim == psi.ndim else m.diag[..., None]
    avx = av if psi.ndim == 1 else av[:, None]
    num = _match_rank(m.source, psi) - offdiag_matvec(m, psi, topo) \
        - (d - avx) * psi
    v = geom.vol if psi.ndim == 1 else geom.vol[:, None]
    return num / v


def H1(m: FvMatrix, geom, topo) -> jnp.ndarray:
    """OpenFOAM fvMatrix::H1 — negated off-diagonal row sums / volume
    (volScalarField; scalar even for vector matrices). Used by SIMPLEC's
    rAtU = 1/(1/rAU - H1) (reference DAResidualSimpleFoam.C
    simple.consistent() branch). Boundary value-coefficients are folded
    into diag/source in this storage and are not separable; omitting them
    only changes the rAtU acceleration, never the converged solution."""
    from dafoam_tpu.ops.core import face_sum_pair

    return face_sum_pair(-m.upper, -m.lower, topo) / geom.vol


def relax(m: FvMatrix, psi: jnp.ndarray, alpha: float, topo) -> FvMatrix:
    """Under-relax the matrix (OpenFOAM fvMatrix::relax):

    enforce diagonal dominance, divide diag by alpha, and compensate the
    source with (Dnew - Dold)*psi_current so the converged solution is
    unchanged. Part of the residual definition in the reference
    (DAResidualSimpleFoam.C:150 calls UEqn.relax() before forming URes).
    """
    if alpha >= 1.0 - 1e-12:
        return m
    from dafoam_tpu.ops.core import face_sum_pair
    sum_off = face_sum_pair(jnp.abs(m.upper), jnp.abs(m.lower), topo)
    d0 = m.diag
    if d0.ndim == 2:
        so = sum_off[:, None]
    else:
        so = sum_off
    dmag = jnp.maximum(jnp.abs(d0), so)
    dnew = jnp.where(d0 >= 0, dmag, -dmag) / alpha
    psi_m = psi if psi.ndim == d0.ndim else psi  # shapes already align
    src = m.source + (dnew - d0) * psi_m
    return m._replace(diag=dnew, source=src)


def set_reference(m: FvMatrix, cell: int, value: float) -> FvMatrix:
    """Pin a reference value (OpenFOAM fvMatrix::setReference): used by the
    pressure equation (pRefCell=0, pRefValue=0 hardcoded in the reference,
    DAResidualSimpleFoam.C:160-162)."""
    d = m.diag[cell]
    src = m.source.at[cell].add(d * value)
    diag = m.diag.at[cell].add(d)
    return m._replace(diag=diag, source=src)
