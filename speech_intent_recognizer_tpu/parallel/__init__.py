from speech_intent_recognizer_tpu.parallel.mesh import (
    MeshSpec,
    create_mesh,
    local_batch_size,
)
from speech_intent_recognizer_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
)
from speech_intent_recognizer_tpu.parallel.distributed import (
    initialize_distributed,
)

__all__ = [
    "MeshSpec",
    "batch_sharding",
    "create_mesh",
    "initialize_distributed",
    "local_batch_size",
    "param_shardings",
    "replicated",
    "shard_batch",
]
