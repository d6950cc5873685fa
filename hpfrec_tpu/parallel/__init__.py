from .mesh import make_mesh, default_mesh  # noqa: F401
from .engine import make_sharded_segment_sums, shard_blocked_data  # noqa: F401
