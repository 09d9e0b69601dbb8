from .mesh import (  # noqa: F401
    maybe_initialize_distributed,
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated_sharding,
    spatial_sharding,
)
