from mvip_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_leading,
    initialize_multihost,
)
