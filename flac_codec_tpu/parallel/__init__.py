"""Orchestration plane: frame batching, mesh sharding, batch encode/decode
pipelines (SURVEY §7 orchestration plane).
"""

from .batch import BatchEncoder, assemble_frames  # noqa: F401
from .mesh import batch_mesh, shard_batch  # noqa: F401
