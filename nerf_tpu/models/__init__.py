from nerf_tpu.models.nerf import NerfNetwork  # noqa: F401
