from mvip_tpu.ops.embed import positional_encoding, embedding_dim
from mvip_tpu.ops.sampling import stratified_z_vals, sample_pdf
from mvip_tpu.ops.compositing import composite, CompositeOutputs
from mvip_tpu.ops.ndc import ndc_rays
from mvip_tpu.ops.rays import (
    ray_directions,
    rays_for_pose,
    rays_at_coords,
)
