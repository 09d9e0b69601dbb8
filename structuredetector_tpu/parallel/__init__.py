from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated_sharding,
)
