"""NerfNetwork: position -> density, then direction -> color.

Reference parity: `NerfNetwork<T>` (include/nerf-cuda/nerf_network.h):
  - pos encoding built with alignment 16 when the density net is a fused
    type, else 8 (nerf_network.h:103-111)
  - dir encoding aligned to minimum_alignment(rgb_network) (:113-115)
  - density net: n_input_dims = pos padded width, n_output_dims defaults
    to 16 (:117-124)
  - rgb input width = next_multiple(dir_padded + density_padded, rgb_align)
    (:127-130); rgb rows [0, density_padded) carry the raw density-net
    output, rows [density_padded, +dir_padded) the dir encoding
    (:162-182); any remaining pad rows are zero here (the reference leaves
    them uninitialised — nerf_network.h:158-160)
  - rgb net: n_output_dims = 3 (:132-135)
  - final output: rows 0..2 = rgb-net output, row 3 = sigma_activation of
    density-net row 0 (extract_density, :50-61 and :187-195); default
    sigma activation "Exponential" (:125)
  - flat parameter order: density MLP | rgb MLP | pos encoding | dir
    encoding (set_params, :273-291)
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from nerf_tpu.encodings.base import next_multiple
from nerf_tpu.encodings.factory import create_encoding
from nerf_tpu.networks.mlp import activation_fn, create_network, minimum_alignment


class NerfNetwork:
    def __init__(self, n_pos_dims: int, n_dir_dims: int, n_extra_dims: int,
                 dir_offset: int, pos_encoding: Dict, dir_encoding: Dict,
                 density_network: Dict, rgb_network: Dict,
                 compute_dtype=jnp.float32):
        self.n_pos_dims = n_pos_dims
        self.n_dir_dims = n_dir_dims
        self.n_extra_dims = n_extra_dims
        self.dir_offset = dir_offset
        self.compute_dtype = compute_dtype

        density_otype = str(density_network.get("otype", "")).lower()
        pos_align = 16 if density_otype in ("fullyfusedmlp",
                                            "megakernelmlp") else 8
        self.pos_encoding = create_encoding(n_pos_dims, pos_encoding,
                                            alignment=pos_align)

        rgb_alignment = minimum_alignment(rgb_network)
        self.dir_encoding = create_encoding(n_dir_dims + n_extra_dims,
                                            dir_encoding,
                                            alignment=rgb_alignment)

        density_cfg = dict(density_network)
        density_cfg["n_input_dims"] = self.pos_encoding.padded_output_dim
        density_cfg.setdefault("n_output_dims", 16)
        self.density_network = create_network(density_cfg,
                                              compute_dtype=compute_dtype)
        self.sigma_activation = str(density_cfg.get("sigma_activation",
                                                    "Exponential"))

        self.rgb_network_input_width = next_multiple(
            self.dir_encoding.padded_output_dim
            + self.density_network.padded_output_width,
            rgb_alignment,
        )
        rgb_cfg = dict(rgb_network)
        rgb_cfg["n_input_dims"] = self.rgb_network_input_width
        rgb_cfg["n_output_dims"] = 3
        self.rgb_network = create_network(rgb_cfg, compute_dtype=compute_dtype)

        self._sections = [
            ("density_mlp", self.density_network.n_params),
            ("rgb_mlp", self.rgb_network.n_params),
            ("pos_encoding", self.pos_encoding.n_params),
            ("dir_encoding", self.dir_encoding.n_params),
        ]

    # -- parameters ------------------------------------------------------
    @property
    def n_params(self) -> int:
        return sum(n for _, n in self._sections)

    @property
    def input_width(self) -> int:
        return self.dir_offset + self.n_dir_dims + self.n_extra_dims

    @property
    def padded_output_width(self) -> int:
        return max(self.rgb_network.padded_output_width, 4)

    @property
    def output_width(self) -> int:
        return 4

    def unpack_params(self, flat) -> Dict[str, jnp.ndarray]:
        """Slice the reference-ordered flat vector (nerf_network.h:273-291)."""
        if flat.shape[0] != self.n_params:
            raise ValueError(
                f"param count mismatch: got {flat.shape[0]}, "
                f"expected {self.n_params}")
        out, off = {}, 0
        for name, n in self._sections:
            out[name] = flat[off:off + n]
            off += n
        return out

    def pack_params(self, tree: Dict[str, jnp.ndarray]):
        return jnp.concatenate([tree[name] for name, _ in self._sections])

    def initialize_constant(self, value: float = 1.0 / 32.0
                            ) -> Dict[str, jnp.ndarray]:
        """Constant-fill init (initialize_xavier_uniform's actual body,
        nerf_network.h:322-336 — the reference fills with 1/32)."""
        return self.unpack_params(
            jnp.full((self.n_params,), value, jnp.float32))

    def hyperparams(self) -> Dict:
        """Config echo (nerf_network.h:411-422)."""
        return {
            "otype": "NerfNetwork",
            "pos_encoding": {
                "otype": type(self.pos_encoding).__name__,
                "n_output_dims": self.pos_encoding.padded_output_dim,
            },
            "dir_encoding": {
                "otype": type(self.dir_encoding).__name__,
                "n_output_dims": self.dir_encoding.padded_output_dim,
            },
            "density_network": {
                "n_neurons": self.density_network.width,
                "n_hidden_layers": self.density_network.n_hidden_layers,
                "n_output_dims": self.density_network.padded_output_width,
            },
            "rgb_network": {
                "n_neurons": self.rgb_network.width,
                "n_hidden_layers": self.rgb_network.n_hidden_layers,
            },
        }

    def init_params(self, key=None) -> Dict[str, jnp.ndarray]:
        if key is None:
            key = jax.random.PRNGKey(42)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "density_mlp": self.density_network.init_params(k1),
            "rgb_mlp": self.rgb_network.init_params(k2),
            "pos_encoding": self.pos_encoding.init_params(k3),
            "dir_encoding": self.dir_encoding.init_params(k4),
        }

    def prepare_params(self, params: Dict) -> Dict:
        """Inference-time parameter form: grid encodings pre-pack their
        gather tables ONCE so round programs don't rebuild them per
        dispatch (ADVICE r2). apply*/density* accept either form."""
        out = dict(params)
        out["pos_encoding"] = self.pos_encoding.prepare_params(
            params["pos_encoding"])
        out["dir_encoding"] = self.dir_encoding.prepare_params(
            params["dir_encoding"])
        return out

    # -- forward ---------------------------------------------------------
    def density_raw(self, params: Dict, pos01):
        """Density-net output [..., padded_density_width]; row 0 is the raw
        (pre-activation) sigma (nerf_network.h:223-242)."""
        h = self.pos_encoding.apply(params["pos_encoding"], pos01)
        return self.density_network.apply(params["density_mlp"], h)

    def density(self, params: Dict, pos01):
        """Activated sigma [...,] (sigma_activation of row 0)."""
        raw = self.density_raw(params, pos01)
        return activation_fn(self.sigma_activation)(raw[..., 0])

    def apply(self, params: Dict, pos01, dir01):
        """Full inference (nerf_network.h:148-196).

        pos01: [..., 3] position mapped to [0,1]; dir01: [..., 3] direction
        mapped to [0,1]. Returns (rgb [..., 3] raw rgb-net output,
        sigma [...] activated density).
        """
        d_out = self.density_raw(params, pos01)  # [..., 16]
        sh = self.dir_encoding.apply(params["dir_encoding"], dir01)
        pad = (self.rgb_network_input_width
               - d_out.shape[-1] - sh.shape[-1])
        parts = [d_out.astype(self.compute_dtype), sh.astype(self.compute_dtype)]
        if pad > 0:
            parts.append(jnp.zeros(d_out.shape[:-1] + (pad,),
                                   self.compute_dtype))
        rgb_in = jnp.concatenate(parts, axis=-1)
        rgb_out = self.rgb_network.apply(params["rgb_mlp"], rgb_in)
        sigma = activation_fn(self.sigma_activation)(
            d_out[..., 0].astype(jnp.float32))
        return rgb_out[..., :3].astype(jnp.float32), sigma

    def apply_cf(self, params: Dict, pos01_cf, dir01_cf):
        """Channel-first forward — the hot-path layout (batch minor-most).

        pos01_cf, dir01_cf: [3, B] -> (rgb [3, B], sigma [B]).
        Same math as apply(); arrays are feature-major throughout (tcnn's
        SoA layout, matrix_layout.h:37-47), so nothing pads on TPU tiles.
        """
        h = self.pos_encoding.apply_cf(params["pos_encoding"], pos01_cf)
        d_out = self.density_network.apply_cf(params["density_mlp"], h)
        sh = self.dir_encoding.apply_cf(params["dir_encoding"], dir01_cf)
        pad = (self.rgb_network_input_width
               - d_out.shape[0] - sh.shape[0])
        parts = [d_out.astype(self.compute_dtype),
                 sh.astype(self.compute_dtype)]
        if pad > 0:
            parts.append(jnp.zeros((pad,) + d_out.shape[1:],
                                   self.compute_dtype))
        rgb_in = jnp.concatenate(parts, axis=0)
        rgb_out = self.rgb_network.apply_cf(params["rgb_mlp"], rgb_in)
        sigma = activation_fn(self.sigma_activation)(
            d_out[0].astype(jnp.float32))
        return rgb_out[:3].astype(jnp.float32), sigma

    # -- fused Pallas head (FullyFusedMLP analog) --------------------------
    @property
    def fused_supported(self) -> bool:
        """True when the dir encoding reduces to plain SH, so the whole
        post-encoding chain can run in the fused TPU kernel."""
        return self._sh_spec() is not None

    def _sh_spec(self):
        from nerf_tpu.encodings.composite import CompositeEncoding
        from nerf_tpu.encodings.spherical import SphericalHarmonicsEncoding

        enc = self.dir_encoding
        if isinstance(enc, CompositeEncoding):
            if len(enc.nested) != 1:
                return None
            enc = enc.nested[0]
        if not isinstance(enc, SphericalHarmonicsEncoding):
            return None
        return (enc.degree, enc.n_to_pad)

    def apply_cf_fused(self, params: Dict, pos01_cf, dir01_cf,
                       interpret: bool = False, block_b: int = 2048):
        """Fused hot path: XLA hash-grid encode + one Pallas kernel for
        density MLP -> SH -> rgb MLP -> sigma extraction
        (nerf_tpu/ops/pallas/fused_network.py). Numerics: bf16 storage,
        fp32 accumulation — the analog of tcnn's __half wmma."""
        from nerf_tpu.ops.pallas.fused_network import fused_nerf_mlp

        spec = self._sh_spec()
        if spec is None:
            return self.apply_cf(params, pos01_cf, dir01_cf)
        degree, pad_front = spec

        h = self.pos_encoding.apply_cf(params["pos_encoding"], pos01_cf)
        d_mats = self.density_network.unflatten(params["density_mlp"])
        r_mats = self.rgb_network.unflatten(params["rgb_mlp"])
        cd = self.compute_dtype if self.compute_dtype != jnp.float32 \
            else jnp.bfloat16
        out = fused_nerf_mlp(
            h, dir01_cf, tuple(d_mats) + tuple(r_mats),
            n_density_mats=len(d_mats),
            sh_degree=degree, sh_pad_front=pad_front,
            rgb_input_width=self.rgb_network_input_width,
            density_act=self.density_network.activation,
            density_out_act=self.density_network.output_activation,
            rgb_act=self.rgb_network.activation,
            rgb_out_act=self.rgb_network.output_activation,
            block_b=block_b, compute_dtype=cd, interpret=interpret)
        sigma = activation_fn(self.sigma_activation)(out[3])
        return out[:3], sigma

    def apply_packed(self, params: Dict, x):
        """Reference-shaped entry: x [..., 6] -> rgbd [..., 4] with
        rows 0..2 = rgb, row 3 = sigma (nerf_network.h:148-196)."""
        pos01 = x[..., : self.n_pos_dims]
        dir01 = x[..., self.dir_offset:
                  self.dir_offset + self.n_dir_dims + self.n_extra_dims]
        rgb, sigma = self.apply(params, pos01, dir01)
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def build_nerf_network(network_config: Dict, bound: float = 1.0,
                       compute_dtype=jnp.float32) -> NerfNetwork:
    """Build from a reference-style config dict (`reset_network`,
    src/nerf_render.cu:111-184), including grid hyperparameter derivation."""
    from nerf_tpu.core.config import derive_grid_config

    n_pos_dims, n_dir_dims, n_extra_dims = 3, 3, 0
    enc_cfg = derive_grid_config(network_config["encoding"], bound=bound,
                                 n_pos_dims=n_pos_dims)
    return NerfNetwork(
        n_pos_dims=n_pos_dims,
        n_dir_dims=n_dir_dims,
        n_extra_dims=n_extra_dims,
        dir_offset=n_pos_dims,
        pos_encoding=enc_cfg,
        dir_encoding=network_config["dir_encoding"],
        density_network=network_config["network"],
        rgb_network=network_config["rgb_network"],
        compute_dtype=compute_dtype,
    )
