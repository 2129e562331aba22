from momentum_tpu.rasterizer.render import (  # noqa: F401
    rasterize,
    render_mesh,
    shade_lambert,
    shade_phong,
)
