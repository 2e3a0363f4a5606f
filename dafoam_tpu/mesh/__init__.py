from dafoam_tpu.mesh.topology import MeshTopology, Patch
from dafoam_tpu.mesh.geometry import MeshGeometry, compute_geometry
from dafoam_tpu.mesh.generate import box_hex_mesh

__all__ = [
    "MeshTopology",
    "Patch",
    "MeshGeometry",
    "compute_geometry",
    "box_hex_mesh",
]
