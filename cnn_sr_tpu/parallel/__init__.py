from .mesh import make_mesh
from .data_parallel import shard_batch, replicate

__all__ = ["make_mesh", "shard_batch", "replicate"]
