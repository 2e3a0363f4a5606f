"""Implicit finite-volume operators (OpenFOAM ``fvm::``): FvMatrix assembly.

Each operator returns an :class:`~dafoam_tpu.ops.fvmatrix.FvMatrix` whose
action ``matvec(M, psi) - M.source`` equals the volume-integrated operator.
Composition mirrors OpenFOAM equation syntax:

    UEqn = fvm.div(...) + fvm.Sp(...) - (explicit terms via add_source)

Boundary contributions are folded into diag/source at assembly using the BC
coefficient quadruples from ``dafoam_tpu.ops.bc`` — the same internalCoeffs/
boundaryCoeffs folding OpenFOAM does at solve time.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.ops import fvc
from dafoam_tpu.ops.bc import BCoef
from dafoam_tpu.ops.core import (scatter_add, boundary_scatter_add,
                                 face_sum_pair, face_sum_signed)
from dafoam_tpu.ops.fvmatrix import FvMatrix


def _zeros_like_state(psi, topo, dtype):
    nc = topo.n_cells
    shape = (nc,) if psi.ndim == 1 else (nc, 3)
    return jnp.zeros(shape, dtype=dtype)


def _rank_r(x, psi):
    """reshape face scalar (n,) for broadcasting against psi-rank values."""
    return x.reshape((-1,) + (1,) * (psi.ndim - 1))


def div(geom, topo, phi_f, psi, bcoef: BCoef, scheme: str = "upwind",
        bounded: bool = False, grad_psi=None) -> FvMatrix:
    """fvm::div(phi, psi): implicit convection.

    scheme: "upwind" | "linear" | "linearUpwind". ``bounded`` subtracts
    Sp(fvc::div(phi), psi) (OpenFOAM 'bounded Gauss' — removes the
    non-conservative part for steady-state runs before continuity is
    converged). "linearUpwind" is the reference airfoil cases' workhorse:
    implicit upwind + explicit deferred correction
    phi * grad_up . (Cf - C_up) — second-order, upwind-stable.
    """
    ni = topo.n_internal
    nc = topo.n_cells
    own = topo.owner[:ni]
    nei = topo.neighbour
    phi_i = phi_f[:ni]
    phi_b = phi_f[ni:] * bcoef.active

    lu_corr = None
    if scheme in ("upwind", "linearUpwind"):
        w = (phi_i >= 0.0).astype(psi.dtype)
        if scheme == "linearUpwind":
            if grad_psi is None:
                from dafoam_tpu.ops.bc import boundary_value
                psi_b = boundary_value(bcoef, psi, topo)
                grad_psi = fvc.grad(geom, topo, psi, psi_b)
            from dafoam_tpu.ops.core import (cell_to_face_nei,
                                             cell_to_face_own)
            pos = (phi_i >= 0.0)
            cc_up = jnp.where(pos[:, None], cell_to_face_own(geom.cc, topo),
                              cell_to_face_nei(geom.cc, topo))
            g_up = jnp.where(
                pos.reshape((-1,) + (1,) * (grad_psi.ndim - 1)),
                cell_to_face_own(grad_psi, topo),
                cell_to_face_nei(grad_psi, topo))
            d = geom.cf[:ni] - cc_up                     # (ni,3)
            if psi.ndim == 2:
                dpsi = jnp.einsum("fi,fij->fj", d, g_up)
            else:
                dpsi = jnp.einsum("fi,fi->f", d, g_up)
            lu_corr = _rank_r(phi_i, psi) * dpsi         # explicit face flux
    elif scheme == "linear":
        w = geom.weights[:ni]
    else:
        raise NotImplementedError(f"div scheme {scheme!r}")

    # owner row: +phi*(w psi_o + (1-w) psi_n) ; neighbour row: -the same
    diag_own = phi_i * w
    upper = phi_i * (1.0 - w)
    lower = -diag_own
    diag_nei = -upper

    diag_s = face_sum_pair(diag_own, diag_nei, topo)

    diag = _zeros_like_state(psi, topo, psi.dtype)
    diag = diag + (diag_s if psi.ndim == 1 else diag_s[:, None])
    source = _zeros_like_state(psi, topo, psi.dtype)

    # boundary: owner row gets phi_b * (vc psi_o + vb)
    pb = _rank_r(phi_b, psi)
    diag = boundary_scatter_add(diag, pb * bcoef.vc, topo)
    source = boundary_scatter_add(source, -pb * bcoef.vb, topo)

    if lu_corr is not None:
        # deferred correction: contribution += surfaceSum(+own/-nei) of the
        # explicit flux, i.e. source -= that sum
        source = source - face_sum_signed(lu_corr, topo)

    m = FvMatrix(diag=diag, lower=lower, upper=upper, source=source)

    if bounded:
        divphi = fvc.div_surface(geom, topo, phi_f * jnp.concatenate(
            [jnp.ones((ni,), phi_f.dtype), bcoef.active]))
        m = m - Sp(geom, topo, divphi, psi)
    return m


def _limit_correction(corr, orth, limit, psi):
    """OpenFOAM limitedSnGrad limiter: scale the explicit non-orthogonal
    correction so it never exceeds limit/(1-limit) x the orthogonal part —
    unlimited corrections at high-non-orthogonality faces (sharp TE cells)
    make the deferred-correction Picard iteration locally divergent and the
    SIMPLE loop stalls in a limit cycle."""
    if limit >= 1.0:
        return corr
    # NaN-safe norms: corr is exactly zero on orthogonal meshes and
    # d|x|/dx at 0 is NaN through jnp.linalg.norm — guard inside the sqrt
    if psi.ndim == 2:
        mag_c = jnp.sqrt(jnp.maximum(jnp.sum(corr * corr, -1), 1e-36))
        mag_o = jnp.sqrt(jnp.maximum(jnp.sum(orth * orth, -1), 1e-36))
    else:
        mag_c = jnp.abs(corr)
        mag_o = jnp.abs(orth)
    # clamp the denominator at a DTYPE-AWARE floor: the quotient-rule jvp
    # divides by denom^2, and with the old `+ 1e-30` additive guard
    # denom^2 ~ 1e-60 UNDERFLOWS to 0 in f32 -> 0/0 = NaN tangents at the
    # degenerate (zero-area) dense-layout faces where mag_c == mag_o == 0.
    # The floor keeps denom^2 normal in either precision; where mag_c is
    # that tiny, corr ~ 0 and the limiter value is irrelevant. On TPU,
    # f64 runs with f32 EXPONENT RANGE (double-float emulation), so the
    # floor is backend-aware (utils/precision.sq_guard): the f64 value
    # 1e-30 squared flushed to 0 on the chip and NaN'd the f64-on-TPU
    # residual vjp (round-2 VERDICT item 2).
    from dafoam_tpu.utils.precision import sq_guard
    tiny = sq_guard(mag_c.dtype)
    lam = jnp.minimum(1.0, limit * mag_o
                      / jnp.maximum((1.0 - limit) * mag_c, tiny))
    return _rank_r(lam, psi) * corr


def laplacian(geom, topo, gamma_f, psi, bcoef: BCoef, corrected: bool = True,
              psi_b=None, grad_psi=None, grad_psi_b=None,
              limit: float = 0.5) -> FvMatrix:
    """fvm::laplacian(gamma, psi)  — 'Gauss linear limited corrected <limit>'.

    gamma_f: (nf,) diffusivity already interpolated to faces.
    corrected: include explicit non-orthogonal correction (needs grad_psi;
    if absent it is computed from psi_b via a Gauss gradient).
    """
    ni = topo.n_internal
    nc = topo.n_cells
    own = topo.owner[:ni]
    nei = topo.neighbour

    dc = geom.nonorth_dc[:ni] if corrected else geom.delta_coeffs[:ni]
    coef = gamma_f[:ni] * geom.magsf[:ni] * dc  # symmetric positive

    upper = coef
    lower = coef
    diag_s = -face_sum_pair(coef, coef, topo)

    diag = _zeros_like_state(psi, topo, psi.dtype)
    diag = diag + (diag_s if psi.ndim == 1 else diag_s[:, None])
    source = _zeros_like_state(psi, topo, psi.dtype)

    # explicit non-orthogonal correction: + div( gamma * k . interp(grad psi) )
    if corrected:
        from dafoam_tpu.ops.core import boundary_gather
        if grad_psi is None:
            if psi_b is None:
                from dafoam_tpu.ops.bc import boundary_value
                psi_b = boundary_value(bcoef, psi, topo)
            grad_psi = fvc.grad(geom, topo, psi, psi_b)
        if grad_psi_b is None:
            grad_psi_b = boundary_gather(grad_psi, topo)
        from dafoam_tpu.ops.core import cell_to_face_nei, cell_to_face_own
        gf = fvc.interpolate(geom, topo, grad_psi, grad_psi_b)[:ni]
        corr = jnp.einsum("fi,fi...->f...", geom.corr_vec[:ni], gf)
        orth = _rank_r(dc, psi) * (cell_to_face_nei(psi, topo)
                                   - cell_to_face_own(psi, topo))
        corr = _limit_correction(corr, orth, limit, psi)
        cflux = _rank_r(gamma_f[:ni] * geom.magsf[:ni], psi) * corr
        # add to owner, subtract from neighbour; goes to SOURCE with minus
        # (contribution(psi) = matvec - source must equal orth + corr)
        source = source - face_sum_signed(cflux, topo)

    # boundary: gamma_b |Sf| (gc psi_own + gb), masked on empty patches
    gb_coef = _rank_r(gamma_f[ni:] * geom.magsf[ni:] * bcoef.active, psi)
    diag = boundary_scatter_add(diag, gb_coef * bcoef.gc, topo)
    source = boundary_scatter_add(source, -gb_coef * bcoef.gb, topo)

    return FvMatrix(diag=diag, lower=lower, upper=upper, source=source)


def laplacian_flux(geom, topo, gamma_f, psi, bcoef: BCoef, corrected=True,
                   grad_psi=None, grad_psi_b=None, limit: float = 0.5):
    """Implicit face flux of the laplacian matrix at the current psi —
    OpenFOAM ``pEqn.flux()`` (used for R_phi, DAResidualSimpleFoam.C:211)."""
    ni = topo.n_internal
    own = topo.owner[:ni]
    nei = topo.neighbour
    from dafoam_tpu.ops.core import (boundary_gather, cell_to_face_nei,
                                     cell_to_face_own)
    dc = geom.nonorth_dc[:ni] if corrected else geom.delta_coeffs[:ni]
    coef = gamma_f[:ni] * geom.magsf[:ni] * dc
    dpsi = cell_to_face_nei(psi, topo) - cell_to_face_own(psi, topo)
    orth = dc * dpsi
    fl_i = coef * dpsi
    if corrected:
        if grad_psi is None:
            from dafoam_tpu.ops.bc import boundary_value
            psi_b = boundary_value(bcoef, psi, topo)
            grad_psi = fvc.grad(geom, topo, psi, psi_b)
        if grad_psi_b is None:
            grad_psi_b = boundary_gather(grad_psi, topo)
        gf = fvc.interpolate(geom, topo, grad_psi, grad_psi_b)[:ni]
        corr = jnp.einsum("fi,fi->f", geom.corr_vec[:ni], gf)
        corr = _limit_correction(corr, orth, limit, psi)
        fl_i = fl_i + gamma_f[:ni] * geom.magsf[:ni] * corr
    fl_b = gamma_f[ni:] * geom.magsf[ni:] * bcoef.active \
        * (bcoef.gc * boundary_gather(psi, topo) + bcoef.gb)
    return jnp.concatenate([fl_i, fl_b])


def div_flux(geom, topo, phi_f, psi, bcoef: BCoef, scheme: str = "upwind"):
    """Implicit face flux of the convection matrix at the current psi:
    phi_f * psi_f(scheme) — the div-part of fvMatrix::flux() needed by
    transonic pressure equations (reference DARhoSimpleCFoam)."""
    ni = topo.n_internal
    phi_i = phi_f[:ni]
    if scheme == "upwind":
        w = (phi_i >= 0.0).astype(psi.dtype)
    else:
        w = geom.weights[:ni]
    from dafoam_tpu.ops.core import (boundary_gather, cell_to_face_nei,
                                     cell_to_face_own)
    fl_i = phi_i * (w * cell_to_face_own(psi, topo)
                    + (1.0 - w) * cell_to_face_nei(psi, topo))
    fl_b = phi_f[ni:] * bcoef.active * (bcoef.vc * boundary_gather(psi, topo)
                                        + bcoef.vb)
    return jnp.concatenate([fl_i, fl_b])


def Sp(geom, topo, coef, psi) -> FvMatrix:
    """fvm::Sp(coef, psi): implicit source, diag += coef * V."""
    ni = topo.n_internal
    d = coef * geom.vol
    diag = _zeros_like_state(psi, topo, psi.dtype)
    diag = diag + (d if psi.ndim == 1 else d[:, None])
    return FvMatrix(
        diag=diag,
        lower=jnp.zeros((ni,), psi.dtype),
        upper=jnp.zeros((ni,), psi.dtype),
        source=_zeros_like_state(psi, topo, psi.dtype),
    )


def ddt(geom, topo, psi, psi_old, dt, psi_oldold=None, scheme="Euler") -> FvMatrix:
    """fvm::ddt: implicit Euler or BDF2 ('backward') time derivative."""
    ni = topo.n_internal
    v = geom.vol if psi.ndim == 1 else geom.vol[:, None]
    if scheme == "Euler":
        diagc = v / dt
        src = v / dt * psi_old
    elif scheme == "backward":
        assert psi_oldold is not None
        diagc = 1.5 * v / dt
        src = v / dt * (2.0 * psi_old - 0.5 * psi_oldold)
    else:
        raise NotImplementedError(scheme)
    diag = _zeros_like_state(psi, topo, psi.dtype) + diagc
    return FvMatrix(
        diag=diag,
        lower=jnp.zeros((ni,), psi.dtype),
        upper=jnp.zeros((ni,), psi.dtype),
        source=_zeros_like_state(psi, topo, psi.dtype) + src,
    )
