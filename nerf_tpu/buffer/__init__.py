from nerf_tpu.buffer.render_buffer import RenderBuffer  # noqa: F401
from nerf_tpu.buffer.tonemap import (  # noqa: F401
    linear_to_srgb,
    srgb_to_linear,
    tonemap,
)
from nerf_tpu.buffer.upsampler import (  # noqa: F401
    BilinearUpsampler,
    LearnedUpsampler,
    create_upsampler,
)
