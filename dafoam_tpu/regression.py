"""In-solver ML models for field inversion / data-driven turbulence.

Re-designs the reference's DARegression (src/adjoint/DARegression/
DARegression.H:159-247): a per-cell model beta = f(features(W); theta)
evaluated INSIDE the residual, with theta an adjoint input. The reference
hand-rolls a dense feed-forward net in C++ and bridges to TensorFlow via
function pointers (pyDAFoam.py:2330 TensorFlowHelper); here a model is an
ordinary jnp function and theta is just another leaf of `inputs`
(registered under inputs["params"]["regressionPar"]) — jax.vjp gives
d(residual)/d(theta) with zero extra machinery.

Input features mirror the reference's physics-based set
(DARegression.C:182-338): VoS, PoD, chiSA, pGradStream, PSoSS, SCurv,
UOrth, KoU2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# feature library (each: state/aux -> (nc,) array)
# ---------------------------------------------------------------------------

def _vorticity_mag(gradU):
    skew = 0.5 * (gradU - jnp.swapaxes(gradU, -1, -2))
    return jnp.sqrt(2.0 * jnp.maximum(jnp.sum(skew * skew, (-2, -1)), 1e-36))


def _strain_mag(gradU):
    sym = 0.5 * (gradU + jnp.swapaxes(gradU, -1, -2))
    return jnp.sqrt(2.0 * jnp.maximum(jnp.sum(sym * sym, (-2, -1)), 1e-36))


def compute_features(names, ctx):
    """ctx: dict with U, gradU, p, gradp, nuTilda, nu, wall_dist, ...
    Returns (nc, F) feature matrix."""
    feats = []
    gradU = ctx["gradU"]
    for n in names:
        if n == "VoS":            # vorticity / strain
            feats.append(_vorticity_mag(gradU) / _strain_mag(gradU))
        elif n == "PoD":          # production / destruction surrogate
            nut = ctx.get("nut", ctx.get("nuTilda"))
            d = jnp.maximum(ctx["wall_dist"], 1e-12)
            feats.append(nut * _strain_mag(gradU) * d ** 2
                         / jnp.maximum(nut, 1e-16) ** 2)
        elif n == "chiSA":
            feats.append(ctx["nuTilda"] / ctx["nu"])
        elif n == "pGradStream":  # streamwise pressure gradient alignment
            U = ctx["U"]
            gp = ctx["gradp"]
            num = jnp.einsum("ci,ci->c", U, gp)
            den = jnp.sqrt(jnp.einsum("ci,ci->c", U, U)
                           * jnp.einsum("ci,ci->c", gp, gp)) + 1e-16
            feats.append(num / den)
        elif n == "PSoSS":        # pressure-strain vs shear-strain surrogate
            gp = ctx["gradp"]
            feats.append(jnp.linalg.norm(gp, axis=-1)
                         / (jnp.linalg.norm(gp, axis=-1)
                            + _strain_mag(gradU) ** 2 + 1e-16))
        elif n == "SCurv":        # streamline curvature surrogate
            U = ctx["U"]
            magU = jnp.linalg.norm(U, axis=-1) + 1e-16
            dUdU = jnp.einsum("ci,cij->cj", U, gradU)
            feats.append(jnp.linalg.norm(jnp.cross(U, dUdU), axis=-1)
                         / magU ** 3)
        elif n == "UOrth":        # velocity / wall-normal orthogonality proxy
            U = ctx["U"]
            magU = jnp.linalg.norm(U, axis=-1) + 1e-16
            dUdU = jnp.einsum("ci,cij->cj", U, gradU)
            feats.append(jnp.abs(jnp.einsum("ci,ci->c", U, dUdU))
                         / (magU * jnp.linalg.norm(dUdU, axis=-1) + 1e-16))
        elif n == "KoU2":         # tke / U^2 (zero for SA-only runs)
            k = ctx.get("k", jnp.zeros_like(ctx["nu"] * ctx["wall_dist"]))
            feats.append(k / (jnp.einsum("ci,ci->c", ctx["U"], ctx["U"])
                              + 1e-16))
        else:
            raise NotImplementedError(f"regression feature {n!r}")
    return jnp.stack(feats, axis=-1)


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

_ACT = {"sigmoid": jnp.tanh, "tanh": jnp.tanh}


def _act(name):
    if name == "sigmoid":
        return lambda x: 1.0 / (1.0 + jnp.exp(-x))
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    if name == "leakyRelu":
        return lambda x: jnp.where(x > 0, x, 0.01 * x)
    raise NotImplementedError(name)


def nn_sizes(hidden, n_features, n_out=1):
    """Flat parameter count for a dense net (matches the reference's flat
    `regressionPar` vector so optimizer plumbing is identical)."""
    sizes = [n_features] + list(hidden) + [n_out]
    return sum(sizes[i] * sizes[i + 1] + sizes[i + 1]
               for i in range(len(sizes) - 1))


def neural_network(theta, features, hidden, activation="sigmoid",
                   out_shift=1.0):
    """Dense feed-forward net over per-cell features -> beta (nc,).

    theta: flat (P,) parameter vector (adjoint input).
    """
    act = _act(activation)
    sizes = [features.shape[-1]] + list(hidden) + [1]
    x = features
    off = 0
    for i in range(len(sizes) - 1):
        nin, nout = sizes[i], sizes[i + 1]
        W = theta[off:off + nin * nout].reshape(nin, nout)
        off += nin * nout
        b = theta[off:off + nout]
        off += nout
        x = x @ W + b
        if i < len(sizes) - 2:
            x = act(x)
    return x[..., 0] + out_shift


def radial_basis_function(theta, features, n_rbf, out_shift=1.0):
    """RBF model: theta = [centers (n_rbf,F), widths (n_rbf,F), weights]."""
    F = features.shape[-1]
    off = 0
    c = theta[off:off + n_rbf * F].reshape(n_rbf, F); off += n_rbf * F
    w = theta[off:off + n_rbf * F].reshape(n_rbf, F); off += n_rbf * F
    a = theta[off:off + n_rbf]
    r2 = ((features[:, None, :] - c[None]) / (w[None] ** 2 + 1e-12)) ** 2
    phi = jnp.exp(-r2.sum(-1))
    return phi @ a + out_shift


# ---------------------------------------------------------------------------
# External user-model bridge (reference DARegression externalTensorFlow:
# DARegression.H betaCompute/betaJacVecProd callbacks registered through
# DAUtility.H:117-124 pyCalcBeta* function pointers). TPU-native analog:
# the host callable runs under jax.pure_callback and its reverse product
# under a custom_vjp, so an external framework (TF/torch/sklearn/...)
# participates in the jitted primal AND the adjoint.
# ---------------------------------------------------------------------------

_EXTERNAL_MODELS: dict = {}


def register_external_model(name: str, compute, vjp):
    """Register a host-side model.

    compute(theta, features) -> beta        (numpy arrays, shapes
                                             (P,), (nc,F) -> (nc,))
    vjp(theta, features, beta_bar) -> (theta_bar, features_bar)
        the reverse product the external framework computes
        (reference betaJacVecProd, DARegression.H:233-247).
    """
    _EXTERNAL_MODELS[name] = (compute, vjp)


def external_model(name, theta, features):
    """beta = f_ext(theta, features) with exact external adjoint."""
    compute, vjp = _EXTERNAL_MODELS[name]
    nc = features.shape[0]
    beta_shape = jax.ShapeDtypeStruct((nc,), features.dtype)

    @jax.custom_vjp
    def f(th, fe):
        return jax.pure_callback(
            lambda t, x: np.asarray(compute(np.asarray(t), np.asarray(x)),
                                    dtype=x.dtype).reshape(nc),
            beta_shape, th, fe, vmap_method="sequential")

    def fwd(th, fe):
        return f(th, fe), (th, fe)

    def bwd(res, bar):
        th, fe = res

        def host(t, x, b):
            tb, xb = vjp(np.asarray(t), np.asarray(x), np.asarray(b))
            return (np.asarray(tb, dtype=t.dtype).reshape(t.shape),
                    np.asarray(xb, dtype=x.dtype).reshape(x.shape))

        out_shapes = (jax.ShapeDtypeStruct(th.shape, th.dtype),
                      jax.ShapeDtypeStruct(fe.shape, fe.dtype))
        return jax.pure_callback(host, out_shapes, th, fe, bar,
                                 vmap_method="sequential")

    f.defvjp(fwd, bwd)
    return f(theta, features)


def evaluate(cfg: dict, theta, feature_ctx):
    """Dispatch one regression model config -> beta field (nc,)."""
    feats = compute_features(cfg["inputNames"], feature_ctx)
    # feature scaling (reference inputShift/inputScale)
    shift = jnp.asarray(cfg.get("inputShift", 0.0))
    scale = jnp.asarray(cfg.get("inputScale", 1.0))
    feats = (feats + shift) * scale
    mtype = cfg.get("modelType", "neuralNetwork")
    if mtype == "neuralNetwork":
        beta = neural_network(theta, feats, cfg["hiddenLayerNeurons"],
                              cfg.get("activationFunction", "sigmoid"),
                              cfg.get("outputShift", 1.0))
    elif mtype == "radialBasisFunction":
        beta = radial_basis_function(theta, feats, cfg["nRBFs"],
                                     cfg.get("outputShift", 1.0))
    elif mtype in ("externalModel", "externalTensorFlow"):
        # reference externalTensorFlow (DARegression.H betaCompute /
        # betaJacVecProd); any host framework registered via
        # register_external_model works
        beta = external_model(cfg["externalModelName"], theta, feats)
    else:
        raise NotImplementedError(mtype)
    lo = cfg.get("outputLowerBound", -1e16)
    hi = cfg.get("outputUpperBound", 1e16)
    return jnp.clip(beta * cfg.get("outputScale", 1.0), lo, hi)
