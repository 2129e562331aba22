from momentum_tpu.rasterizer.render import (  # noqa: F401
    interpolate_attribute,
    rasterize,
    render_mesh_textured,
    sample_texture,
    render_mesh,
    render_mesh_shadowed,
    render_shadow_map,
    shadow_factor,
    shade_lambert,
    shade_phong,
)
