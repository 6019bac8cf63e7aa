from .mesh import make_mesh, row_sharding
from .hxv import sharded_sector_op, solve_sector_sharded

__all__ = ["make_mesh", "row_sharding", "sharded_sector_op",
           "solve_sector_sharded"]
