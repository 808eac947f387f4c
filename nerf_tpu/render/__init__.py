from nerf_tpu.render.rays import (  # noqa: F401
    generate_rays,
    near_far_from_aabb,
    nerf_matrix_to_ngp,
)
from nerf_tpu.render.march import render_rays  # noqa: F401
from nerf_tpu.render.engine import NerfRender  # noqa: F401
