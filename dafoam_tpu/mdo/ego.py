"""Surrogate-based global optimization (EGO / Bayesian optimization).

Re-designs the reference's surrogateOptimization layer
(dafoam/pyDAFoam.py:2406-2817: SMT KRG surrogates + EGO with
penalty-based constraints) without the SMT dependency: an anisotropic-RBF
Gaussian process written in JAX (hyperparameters tuned by L-BFGS on the
log marginal likelihood) and an Expected Improvement acquisition maximized
by multi-start L-BFGS. Constraints enter as penalties, like the
reference (pyDAFoam.py:2698-2771).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(X1, X2, log_ls, log_amp):
    ls = jnp.exp(log_ls)
    d = (X1[:, None, :] - X2[None, :, :]) / ls
    r2 = jnp.sum(d * d, axis=-1)
    return jnp.exp(log_amp) * jnp.exp(-0.5 * r2)


class GP:
    """Anisotropic squared-exponential GP (KRG-equivalent)."""

    def __init__(self, noise=1e-10):
        self.noise = noise
        self.params = None
        self.X = None
        self.y = None

    def fit(self, X, y, restarts=3, seed=0):
        from scipy.optimize import minimize

        X = jnp.asarray(X, jnp.float64)
        y = jnp.asarray(y, jnp.float64)
        self.ymean, self.ystd = float(y.mean()), float(y.std() + 1e-12)
        yn = (y - self.ymean) / self.ystd
        n, d = X.shape

        def nll(theta):
            log_ls, log_amp = theta[:d], theta[d]
            K = _kernel(X, X, log_ls, log_amp) \
                + (self.noise + jnp.exp(theta[d + 1])) * jnp.eye(n)
            L = jnp.linalg.cholesky(K)
            a = jax.scipy.linalg.cho_solve((L, True), yn)
            return 0.5 * yn @ a + jnp.sum(jnp.log(jnp.diag(L)))

        nll_g = jax.jit(jax.value_and_grad(nll))
        rng = np.random.default_rng(seed)
        best = None
        for r in range(restarts):
            t0 = np.concatenate([rng.normal(-0.5, 0.5, d), [0.0], [-12.0]])
            res = minimize(lambda t: [np.asarray(v) for v in nll_g(jnp.asarray(t))],
                           t0, jac=True, method="L-BFGS-B")
            if best is None or res.fun < best.fun:
                best = res
        theta = jnp.asarray(best.x)
        self.params = theta
        self.X, self.yn = X, yn
        K = _kernel(X, X, theta[:d], theta[d]) \
            + (self.noise + jnp.exp(theta[d + 1])) * jnp.eye(n)
        self.L = jnp.linalg.cholesky(K)
        self.alpha = jax.scipy.linalg.cho_solve((self.L, True), yn)
        return self

    def predict(self, Xq):
        d = self.X.shape[1]
        theta = self.params
        Kq = _kernel(jnp.asarray(Xq), self.X, theta[:d], theta[d])
        mu = Kq @ self.alpha
        v = jax.scipy.linalg.solve_triangular(self.L, Kq.T, lower=True)
        var = jnp.exp(theta[d]) - jnp.sum(v * v, axis=0)
        var = jnp.maximum(var, 1e-14)
        return mu * self.ystd + self.ymean, jnp.sqrt(var) * self.ystd


def expected_improvement(mu, sigma, f_best):
    z = (f_best - mu) / sigma
    cdf = 0.5 * (1.0 + jax.scipy.special.erf(z / jnp.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * z * z) / jnp.sqrt(2.0 * jnp.pi)
    return (f_best - mu) * cdf + sigma * pdf


def ego_minimize(func, bounds, n_init=8, n_iter=20, seed=0,
                 constraints=None, penalty=1e3):
    """EGO loop: func(x) -> scalar (expensive); bounds: (d,2) array.

    constraints: optional list of callables g(x) <= 0 evaluated WITH func
    (penalized, reference pyDAFoam.py:2698-2771 style)."""
    from scipy.optimize import minimize

    bounds = np.asarray(bounds, dtype=float)
    d = bounds.shape[0]
    rng = np.random.default_rng(seed)
    X = rng.uniform(bounds[:, 0], bounds[:, 1], size=(n_init, d))

    def penalized(x):
        f = func(x)
        if constraints:
            for g in constraints:
                f = f + penalty * max(0.0, g(x)) ** 2
        return f

    y = np.array([penalized(x) for x in X])

    for it in range(n_iter):
        gp = GP().fit(X, y, seed=seed + it)
        f_best = float(y.min())

        neg_ei = jax.jit(lambda x: -expected_improvement(
            *gp.predict(x[None]), f_best)[0])
        neg_ei_g = jax.jit(jax.grad(lambda x: -expected_improvement(
            *gp.predict(x[None]), f_best)[0]))

        best_x, best_v = None, np.inf
        starts = rng.uniform(bounds[:, 0], bounds[:, 1], size=(8, d))
        for s in starts:
            res = minimize(lambda x: float(neg_ei(jnp.asarray(x))), s,
                           jac=lambda x: np.asarray(neg_ei_g(jnp.asarray(x))),
                           bounds=bounds, method="L-BFGS-B")
            if res.fun < best_v:
                best_v, best_x = res.fun, res.x
        X = np.vstack([X, best_x])
        y = np.append(y, penalized(best_x))

    i = int(np.argmin(y))
    return {"x": X[i], "fun": float(y[i]), "X": X, "y": y}
