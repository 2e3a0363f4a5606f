"""Pallas TPU kernels: banded (DIA) matvec parity with the XLA path.

On CPU the kernel runs under the Pallas interpreter; on a real TPU it
compiles through Mosaic (exercised by scripts/bench_pallas.py and the
fvmatrix.matvec_fn fast path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dafoam_tpu.ops import pallas_kernels as pk


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("offsets", [(1, 64, 65), (-1, 1), (2,), ()])
def test_dia_matvec_interpret_parity(offsets):
    n = 512
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    diag = jax.random.normal(k1, (n,), jnp.float32) + 5.0
    coef = jax.random.normal(k2, (max(len(offsets), 1), n), jnp.float32)
    x = jax.random.normal(k3, (n,), jnp.float32)
    y_ref = pk.dia_matvec_reference(diag, coef, offsets, x)
    y = pk.dia_matvec(diag, coef, offsets, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("offsets", [(1, 64, 65), (-1, 1), (-65, -64, -1, 1, 64, 65)])
def test_dia_matvec_ad_vjp_parity(offsets):
    """dia_matvec_ad's custom reverse rule must equal jax's AD of the XLA
    reference, for ALL THREE cotangents (diag, coef, x) — this is the rule
    that lets the fixed-point adjoint and the unsteady reverse scans
    differentiate through Pallas-kernel Krylov/smoother loops on TPU."""
    n = 384
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    diag = jax.random.normal(k1, (n,), jnp.float32) + 5.0
    coef = jax.random.normal(k2, (len(offsets), n), jnp.float32)
    x = jax.random.normal(k3, (n,), jnp.float32)
    ct = jax.random.normal(k4, (n,), jnp.float32)

    _, vjp_k = jax.vjp(
        lambda d, c, xx: pk.dia_matvec_ad(d, c, offsets, xx,
                                          interpret=True), diag, coef, x)
    _, vjp_r = jax.vjp(
        lambda d, c, xx: pk.dia_matvec_reference(d, c, offsets, xx),
        diag, coef, x)
    for a, b in zip(vjp_k(ct), vjp_r(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not pk.HAVE_PALLAS, reason="pallas unavailable")
def test_dia_matvec_matches_fvmatrix_semantics():
    """The kernel semantics must equal matvec_fn's banded path: build a
    small banded FvMatrix and compare against the generic matvec."""
    from dafoam_tpu.mesh import box_hex_mesh
    from dafoam_tpu.mesh.topology import to_dia_dense
    from dafoam_tpu.ops import fvmatrix as fvx

    pts, topo = box_hex_mesh(12, 8, 1, kinds={"zmin": "empty",
                                              "zmax": "empty"})
    topo = to_dia_dense(topo)
    nc, ni = topo.n_cells, topo.n_internal
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    m = fvx.FvMatrix(diag=jax.random.normal(k1, (nc,)) + 8.0,
                     lower=jax.random.normal(k2, (ni,)),
                     upper=jax.random.normal(k3, (ni,)),
                     source=jnp.zeros((nc,)))
    x = jax.random.normal(k4, (nc,))
    y_generic = fvx.matvec(m, x, topo)
    offsets, face_idx, kind = topo.dia()
    # reproduce matvec_fn's coefficient layout, then run the kernel
    from dafoam_tpu.ops.core import _shift_bwd
    offs_d, _ = topo.dia_dense()
    up_k = m.upper.reshape(len(offs_d), nc)
    lo_k = m.lower.reshape(len(offs_d), nc)
    pos = {int(o): i for i, o in enumerate(offs_d)}
    rows = []
    for o in offsets.tolist():
        rows.append(up_k[pos[o]] if o > 0
                    else _shift_bwd(lo_k[pos[-o]], -o))
    coef = jnp.stack(rows).astype(jnp.float32)
    y_k = pk.dia_matvec(m.diag.astype(jnp.float32), coef,
                        tuple(int(o) for o in offsets.tolist()),
                        x.astype(jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_generic),
                               rtol=2e-5, atol=2e-5)
