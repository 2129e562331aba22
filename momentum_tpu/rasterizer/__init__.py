from momentum_tpu.rasterizer.render import (  # noqa: F401
    interpolate_attribute,
    rasterize,
    render_mesh_textured,
    sample_texture,
    render_mesh,
    shade_lambert,
    shade_phong,
)
