import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.linalg.krylov import bicgstab, cg, gmres


def _sys(n=48, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    A = np.eye(n) * 3 + rng.normal(size=(n, n)) * 0.3
    if spd:
        A = A @ A.T + np.eye(n)
    b = rng.normal(size=n)
    return jnp.asarray(A), jnp.asarray(b)


def test_gmres_restarts_and_early_convergence():
    A, b = _sys()
    for m in (10, 60, 200):
        x, info = gmres(lambda v: A @ v, b, restart=m, rel_tol=1e-10,
                        max_iters=1000)
        err = np.abs(np.asarray(A @ x - b)).max()
        assert np.isfinite(np.asarray(x)).all(), m
        assert err < 1e-8, (m, err)
        assert bool(info.converged)


def test_gmres_preconditioned():
    A, b = _sys(64, 1)
    dinv = 1.0 / jnp.diag(A)
    x, info = gmres(lambda v: A @ v, b, precond=lambda r: dinv * r,
                    restart=30, rel_tol=1e-12)
    assert np.abs(np.asarray(A @ x - b)).max() < 1e-9


def test_gmres_pytree():
    A, b = _sys(40, 2)
    bt = {"a": b[:20], "b": b[20:]}

    def mv(t):
        v = jnp.concatenate([t["a"], t["b"]])
        av = A @ v
        return {"a": av[:20], "b": av[20:]}

    x, info = gmres(mv, bt, restart=25, rel_tol=1e-11)
    xv = jnp.concatenate([x["a"], x["b"]])
    assert np.abs(np.asarray(A @ xv - b)).max() < 1e-8


def test_cg_spd():
    A, b = _sys(50, 3, spd=True)
    x, info = cg(lambda v: A @ v, b, rel_tol=1e-12, max_iters=500)
    assert np.abs(np.asarray(A @ x - b)).max() < 1e-7
    assert bool(info.converged)


def test_bicgstab():
    A, b = _sys(50, 4)
    x, info = bicgstab(lambda v: A @ v, b, rel_tol=1e-12, max_iters=500)
    assert np.abs(np.asarray(A @ x - b)).max() < 1e-7
