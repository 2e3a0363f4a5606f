"""Boundary conditions as pure coefficient functions.

Every OpenFOAM fvPatchField is characterized, for assembly purposes, by four
per-face coefficient arrays (valueInternalCoeffs, valueBoundaryCoeffs,
gradientInternalCoeffs, gradientBoundaryCoeffs):

    boundary value    psi_b     = vc * psi_own + vb
    boundary snGrad   dpsi/dn|b = gc * psi_own + gb

The reference applies BCs through the differentiated OpenFOAM fork
(``correctBoundaryConditions`` inside the taped residual, e.g.
src/adjoint/DAResidual/DAResidualSimpleFoam.C:250-265); here they are plain
pure functions so ``jax.vjp`` differentiates them natively, including w.r.t.
BC *values* (patchVelocity/AoA design variables, reference
src/adjoint/DAInput/DAInputPatchVelocity.C).

Static data (BC types per patch) lives in the spec dict; traced data (the
values) lives in a separate ``values`` pytree so BC values can be design
inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dafoam_tpu.utils.precision import guard_tiny


class BCoef(NamedTuple):
    vc: jnp.ndarray      # (nb,) or (nb,3) value internal coeff
    vb: jnp.ndarray      # value boundary coeff
    gc: jnp.ndarray      # gradient internal coeff
    gb: jnp.ndarray      # gradient boundary coeff
    active: jnp.ndarray  # (nb,) 1.0 except empty patches


_ZG_TYPES = ("zeroGradient", "extrapolated")
_FV_TYPES = ("fixedValue", "noSlip", "calculated")


def _expand(val, size, rank, dtype):
    v = jnp.asarray(val, dtype=dtype)
    target = (size, 3) if rank == 1 else (size,)
    return jnp.broadcast_to(v, target)


def _params(spec: dict, values: dict, pname: str) -> dict:
    """Merge the static spec with a traced per-patch override dict, so
    parametric-BC parameters can be design inputs."""
    over = values.get(pname, {})
    if not isinstance(over, dict):
        return spec
    return {**spec, **over}


def coeffs(bcspec: dict, values: dict, topo, geom, psi: jnp.ndarray,
           rank: int = 0, phi_b: jnp.ndarray | None = None,
           t=0.0) -> BCoef:
    """Assemble boundary coefficient arrays for one field over all patches.

    bcspec : {patch_name: {"type": str, ...}} (static)
    values : {patch_name: array-or-dict} traced BC values; dict-valued
             entries override the static parameters of parametric BCs
             (multiFreq*, varyingVelocity*, homTemp, ...) so they can be
             design inputs
    psi    : (nc,) or (nc,3) current cell values (for lagged/symmetry terms)
    phi_b  : (nb,) boundary face flux, needed by inletOutlet-family BCs
    t      : traced physical time for time-dependent BCs (reference
             DAMisc multiFreq/varyingVelocity updateCoeffs use
             time().timeOutputValue())
    """
    from dafoam_tpu.ops.core import boundary_gather
    ni = topo.n_internal
    dtype = psi.dtype
    psi_own_all = boundary_gather(psi, topo)
    dc_all = geom.nonorth_dc[ni:]
    sf_all = geom.sf[ni:]
    magsf_all = jnp.maximum(geom.magsf[ni:], 1e-36)

    vcs, vbs, gcs, gbs, acts = [], [], [], [], []
    for p in topo.patches:
        sl = slice(p.start - ni, p.start - ni + p.size)
        n = p.size
        spec = bcspec.get(p.name, {"type": "zeroGradient"})
        btype = spec["type"]
        psi_own = psi_own_all[sl]
        dc = dc_all[sl]
        if rank == 1:
            dc_b = dc[:, None]
        else:
            dc_b = dc

        one = jnp.ones_like(psi_own)
        zero = jnp.zeros_like(psi_own)
        act = jnp.ones((n,), dtype=dtype)

        if btype == "empty":
            vc, vb, gc, gb = zero, zero, zero, zero
            act = jnp.zeros((n,), dtype=dtype)
        elif btype in _ZG_TYPES or (rank == 0 and btype in ("symmetry", "slip")):
            vc, vb, gc, gb = one, zero, zero, zero
        elif btype in _FV_TYPES:
            val = _expand(values.get(p.name, 0.0), n, rank, dtype)
            vc, vb = zero, val
            gc, gb = -dc_b * one, dc_b * val
        elif btype == "fixedGradient":
            g = _expand(values.get(p.name, 0.0), n, rank, dtype)
            vc, vb = one, g / dc_b
            gc, gb = zero, g
        elif btype == "mixed":
            # Robin BC (OpenFOAM mixedFvPatchField): used by the CHT
            # coupling protocol (reference DAInputThermalCoupling.C:76-148:
            # valueFraction = K_nei/(K_my+K_nei)).
            # values[patch] = {"refValue": .., "refGrad": .., "valueFraction": ..}
            v = values.get(p.name, {})
            rv = _expand(v.get("refValue", 0.0), n, rank, dtype)
            rg = _expand(v.get("refGrad", 0.0), n, rank, dtype)
            vf = _expand(v.get("valueFraction", 1.0), n, rank, dtype)
            vc = (1.0 - vf) * one
            vb = vf * rv + (1.0 - vf) * rg / dc_b
            gc = -vf * dc_b
            gb = vf * rv * dc_b + (1.0 - vf) * rg
        elif btype == "inletOutlet":
            if phi_b is None:
                raise ValueError("inletOutlet BC needs phi_b")
            val = _expand(values.get(p.name, 0.0), n, rank, dtype)
            out = phi_b[sl] >= 0.0  # outflow -> zeroGradient
            if rank == 1:
                out = out[:, None]
            vc = jnp.where(out, one, zero)
            vb = jnp.where(out, zero, val)
            gc = jnp.where(out, zero, -dc_b * one)
            gb = jnp.where(out, zero, dc_b * val)
        elif btype in ("symmetry", "slip") and rank == 1:
            nhat = sf_all[sl] / magsf_all[sl][:, None]
            # psi_b = psi - (psi.n) n ; per-component implicit part 1-n_c^2,
            # cross-component part lagged (OpenFOAM per-cmpt approximation)
            psin = jnp.einsum("fi,fi->f", psi_own, nhat)
            vc = 1.0 - nhat * nhat
            vb = -(psin[:, None] - psi_own * nhat) * nhat
            gc = (vc - 1.0) * dc_b
            gb = vb * dc_b
        elif btype in ("multiFreqScalar", "multiFreqVector"):
            # DAMisc/multiFreq{Scalar,Vector}FvPatchField.C updateCoeffs:
            # fixedValue refValue + sum_i a_i sin(2 pi f_i t + ph_i)
            # (vector variant adds the oscillation to one component,
            # only while t < endTime)
            pr = _params(spec, values, p.name)
            amps = jnp.asarray(pr.get("amplitudes", ()), dtype)
            freqs = jnp.asarray(pr.get("frequencies", ()), dtype)
            phases = jnp.asarray(pr.get("phases", ()), dtype)
            nf = max(amps.shape[0], freqs.shape[0], phases.shape[0])
            amps = jnp.broadcast_to(amps, (nf,)) if nf else amps
            freqs = jnp.broadcast_to(freqs, (nf,)) if nf else freqs
            phases = jnp.broadcast_to(phases, (nf,)) if nf else phases
            osc = jnp.sum(amps * jnp.sin(2.0 * jnp.pi * freqs * t
                                         + phases)) if nf else \
                jnp.asarray(0.0, dtype)
            if btype == "multiFreqScalar":
                val = _expand(pr.get("refValue", 0.0), n, 0, dtype) + osc
            else:
                end_t = pr.get("endTime", None)
                if end_t is not None:
                    osc = jnp.where(jnp.asarray(t, dtype)
                                    < jnp.asarray(end_t, dtype), osc, 0.0)
                comp = int(spec.get("component", 0))
                val = _expand(pr.get("refValue", [0.0, 0.0, 0.0]), n, 1,
                              dtype)
                val = val.at[:, comp].add(osc)
            vc, vb = zero, val
            gc, gb = -dc_b * one, dc_b * val
        elif btype in ("varyingVelocity", "varyingVelocityInletOutlet"):
            # DAMisc/varyingVelocity*.C: U(t) = U0 + URate*t at angle
            # alpha(t) = alpha0 + alphaRate*t, split over the flow /
            # normal components; the InletOutlet variant switches to
            # zeroGradient on outflow faces (valueFraction = 1-pos0(phi))
            pr = _params(spec, values, p.name)
            Ut = jnp.asarray(pr.get("U0", 0.0), dtype) \
                + jnp.asarray(pr.get("URate", 0.0), dtype) * t
            al = jnp.asarray(pr.get("alpha0", 0.0), dtype) \
                + jnp.asarray(pr.get("alphaRate", 0.0), dtype) * t
            fc = int(spec.get("flowComponent", 0))
            nc_ = int(spec.get("normalComponent", 1))
            val = jnp.zeros((n, 3), dtype)
            val = val.at[:, fc].set(Ut * jnp.cos(al))
            val = val.at[:, nc_].set(Ut * jnp.sin(al))
            if btype == "varyingVelocity":
                vc, vb = zero, val
                gc, gb = -dc_b * one, dc_b * val
            else:
                if phi_b is None:
                    raise ValueError(
                        "varyingVelocityInletOutlet BC needs phi_b")
                out = phi_b[sl] >= 0.0
                out = out[:, None]
                vc = jnp.where(out, one, zero)
                vb = jnp.where(out, zero, val)
                gc = jnp.where(out, zero, -dc_b * one)
                gb = jnp.where(out, zero, dc_b * val)
        elif btype == "homTemp":
            # DAMisc/homTemp: homogenized thin-solid-layer wall,
            # T_face = (T_base + C T_cell) / (1 + C),
            # C = kF/kS * solidThickness * deltaCoeffs
            pr = _params(spec, values, p.name)
            kS = jnp.asarray(pr.get("kS", 1.0), dtype)
            kF = jnp.asarray(pr.get("kF", 1.0), dtype)
            th = jnp.asarray(pr.get("solidThickness", 0.0), dtype)
            Tb = _expand(pr.get("baseTemperature", 0.0), n, 0, dtype)
            C = kF / kS * th * dc
            vc = (C / (1.0 + C)) * one
            vb = Tb / (1.0 + C)
            gc = (vc - 1.0) * dc_b
            gb = vb * dc_b
        elif btype == "wallHeatFluxTransfer":
            # DAMisc/wallHeatFluxTransfer: mixed BC with external heat
            # transfer coefficient h and ambient Ta,
            # valueFraction = h / (h + kappa*deltaCoeffs), refGrad = 0
            pr = _params(spec, values, p.name)
            hh = _expand(pr.get("h", 0.0), n, 0, dtype)
            Ta = _expand(pr.get("Ta", 293.0), n, 0, dtype)
            kap = _expand(pr.get("kappa", 1.0), n, 0, dtype)
            vf = hh / jnp.maximum(hh + kap * dc, guard_tiny(dtype))
            vc = (1.0 - vf) * one
            vb = vf * Ta
            gc = -vf * dc_b
            gb = vf * Ta * dc_b
        elif btype == "fixedWallHeatFlux":
            # DAMisc/fixedWallHeatFlux: fixedGradient with
            # grad = q / ((nut/Prt + nu/Pr) * Cp); the solver supplies the
            # per-face effective diffusivity*Cp as `alphaCpEff` (it owns
            # nut at the wall)
            pr = _params(spec, values, p.name)
            q = _expand(pr.get("heatFlux", 0.0), n, 0, dtype)
            aCp = _expand(pr.get("alphaCpEff", 1.0), n, 0, dtype)
            g = q / jnp.maximum(aCp, guard_tiny(dtype))
            vc, vb = one, g / dc_b
            gc, gb = zero, g
        else:
            raise NotImplementedError(f"BC type {btype!r} (patch {p.name})")

        vcs.append(vc); vbs.append(vb); gcs.append(gc); gbs.append(gb)
        acts.append(act)

    return BCoef(
        vc=jnp.concatenate(vcs), vb=jnp.concatenate(vbs),
        gc=jnp.concatenate(gcs), gb=jnp.concatenate(gbs),
        active=jnp.concatenate(acts),
    )


def boundary_value(bcoef: BCoef, psi: jnp.ndarray, topo) -> jnp.ndarray:
    """psi_b = vc*psi_own + vb on every boundary face."""
    from dafoam_tpu.ops.core import boundary_gather
    return bcoef.vc * boundary_gather(psi, topo) + bcoef.vb


def boundary_sngrad(bcoef: BCoef, psi: jnp.ndarray, topo) -> jnp.ndarray:
    from dafoam_tpu.ops.core import boundary_gather
    return bcoef.gc * boundary_gather(psi, topo) + bcoef.gb
