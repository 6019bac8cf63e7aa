from .mesh import make_mesh, row_sharding
from .hxv import make_sharded_matvec

__all__ = ["make_mesh", "row_sharding", "make_sharded_matvec"]
