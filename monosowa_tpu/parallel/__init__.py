"""Device-mesh / sharding utilities (the single source of truth for
parallelism — SURVEY.md §5.8)."""

from monosowa_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch)
