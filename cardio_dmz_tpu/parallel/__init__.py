from .mesh import (  # noqa: F401
    make_mesh,
    stream_sharding,
    replicated,
    shard_streams,
)
from .streams import batched_scanner_step, batched_scan_frames  # noqa: F401
