import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh, compute_geometry
from dafoam_tpu.mesh.topology import apply_cell_permutation, renumber_rcm


def test_box_mesh_geometry_uniform():
    nx, ny, nz = 4, 3, 2
    lx, ly, lz = 2.0, 1.5, 1.0
    pts, topo = box_hex_mesh(nx, ny, nz, (lx, ly, lz))
    geom = compute_geometry(jnp.asarray(pts), topo)

    # volumes: each cell is a uniform hex
    vexp = (lx / nx) * (ly / ny) * (lz / nz)
    np.testing.assert_allclose(np.asarray(geom.vol), vexp, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(geom.vol).sum(), lx * ly * lz,
                               rtol=1e-12)

    # face areas on xmin patch
    sl = topo.patch_slice("xmin")
    np.testing.assert_allclose(np.asarray(geom.magsf[sl]),
                               (ly / ny) * (lz / nz), rtol=1e-12)
    # outward normals on xmin point in -x
    np.testing.assert_allclose(np.asarray(geom.sf[sl, 0] / geom.magsf[sl]),
                               -1.0, rtol=1e-12)

    # Gauss divergence of a constant vector field over each closed cell = 0
    ni = topo.n_internal
    from dafoam_tpu.ops.core import surface_sum
    net = surface_sum(geom.sf[:ni], geom.sf[ni:], topo)
    np.testing.assert_allclose(np.asarray(net), 0.0, atol=1e-12)

    # interpolation weights are 0.5 on a uniform mesh
    np.testing.assert_allclose(np.asarray(geom.weights[:ni]), 0.5, atol=1e-12)

    # delta coeffs: 1/dx for x-faces
    d = np.asarray(geom.delta_coeffs[:ni])
    sf = np.asarray(geom.sf[:ni])
    xfaces = np.abs(sf[:, 0]) > 1e-9
    np.testing.assert_allclose(d[xfaces], nx / lx, rtol=1e-12)


def test_geometry_differentiable():
    import jax

    pts, topo = box_hex_mesh(3, 3, 1)

    def total_vol(p):
        return jnp.sum(compute_geometry(p, topo).vol)

    g = jax.grad(total_vol)(jnp.asarray(pts))
    assert np.isfinite(np.asarray(g)).all()
    # moving an interior point does not change total volume
    interior = 1 + 4 * (1 + 4 * 0)  # point (1,1,0)
    # moving the xmax boundary plane outward increases volume by face area
    # check via directional derivative: d(vol)/dx of all xmax points = ly*lz/npts_on_edge...
    # simpler: sum of gradient x-components over xmax plane = area of that plane
    pn = np.asarray(pts)
    xmax_pts = np.isclose(pn[:, 0], pn[:, 0].max())
    np.testing.assert_allclose(np.asarray(g)[xmax_pts, 0].sum(), 1.0 * 0.1,
                               rtol=1e-10)


def test_rcm_permutation_preserves_geometry():
    pts, topo = box_hex_mesh(5, 4, 2)
    perm = renumber_rcm(topo)
    topo2 = apply_cell_permutation(topo, perm)
    g1 = compute_geometry(jnp.asarray(pts), topo)
    g2 = compute_geometry(jnp.asarray(pts), topo2)
    v1 = np.asarray(g1.vol)
    v2 = np.asarray(g2.vol)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    np.testing.assert_allclose(v2, v1[perm], rtol=1e-12)
    np.testing.assert_allclose(np.sort(np.asarray(g2.magsf)),
                               np.sort(np.asarray(g1.magsf)), rtol=1e-12)


def test_wall_distance_exact_surface():
    """Exact point-to-surface wall distance (not face-centre distance):
    on a uniform box the distance to the ymin wall is the y coordinate of
    the cell centre, even for cells offset along x (where the face-centre
    metric overestimates)."""
    import numpy as np
    from dafoam_tpu.mesh import box_hex_mesh
    from dafoam_tpu.mesh.geometry import compute_geometry
    from dafoam_tpu.mesh.walldist import compute_wall_distance
    import jax.numpy as jnp

    # sheared mesh: cell centres are offset in x from the wall-face
    # centres, so the face-centre metric overestimates d
    pts, topo = box_hex_mesh(4, 8, 1, (2.0, 0.8, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall"})
    pts = np.asarray(pts).copy()
    pts[:, 0] += 0.2 * pts[:, 1]
    geom = compute_geometry(jnp.asarray(pts, jnp.float64), topo)
    d = compute_wall_distance(geom, topo, points=np.asarray(pts))
    cc = np.asarray(geom.cc)
    np.testing.assert_allclose(d, cc[:, 1], rtol=1e-12, atol=1e-12)
    # legacy face-centre fallback overestimates for off-centre cells
    d_legacy = compute_wall_distance(geom, topo)
    assert (d_legacy >= d - 1e-12).all()
    assert d_legacy.max() > d.max()  # strictly worse somewhere
