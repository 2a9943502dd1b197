"""kuzu.core — config, mesh/sharding, train engine, checkpoint, metrics."""

from kuzu.core.config import Config, load_config  # noqa: F401
from kuzu.core.mesh import make_mesh, shard_batch  # noqa: F401
