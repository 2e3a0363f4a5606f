from dafoam_tpu.parallel.partition import partition_cells, reorder_for_partitions
from dafoam_tpu.parallel.shard import shard_case, mesh_axis_sharding

__all__ = ["partition_cells", "reorder_for_partitions", "shard_case",
           "mesh_axis_sharding"]
