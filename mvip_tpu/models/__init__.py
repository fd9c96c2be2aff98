from mvip_tpu.models.nerf_mlp import (
    NeRFMLPConfig,
    init_nerf_mlp,
    apply_nerf_mlp,
)
from mvip_tpu.models.nerf_hashgrid import (
    HashGridConfig,
    init_hashgrid_nerf,
    apply_hashgrid_nerf,
)
