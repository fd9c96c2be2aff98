from mvip_tpu.render.renderer import (
    RenderOptions,
    render_rays,
    render_rays_chunked,
    render_image,
)
