from .mesh import MeshConfig, make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding,
    param_pspecs,
    replicated,
    shard_params,
)
