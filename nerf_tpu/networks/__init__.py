from nerf_tpu.networks.mlp import MLP, create_network, minimum_alignment  # noqa: F401
