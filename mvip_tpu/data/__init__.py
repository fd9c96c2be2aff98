from mvip_tpu.data.colmap import (
    Camera,
    Image,
    Point3D,
    read_model,
    write_model,
    qvec2rotmat,
    rotmat2qvec,
)
from mvip_tpu.data.llff import load_llff_scene, LLFFScene
from mvip_tpu.data.depth import load_colmap_depth
from mvip_tpu.data.blender import load_blender_scene
from mvip_tpu.data.dtu import load_dtu_scene
from mvip_tpu.data.nerd import load_nerd_scene
from mvip_tpu.data.rays import build_ray_streams, RayStreams
