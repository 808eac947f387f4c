from nerf_tpu.ops.pallas.fused_network import fused_nerf_mlp  # noqa: F401
