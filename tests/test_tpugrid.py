"""TpuGrid (TPU-native neighborhood grid) — numerics, gradients, and
end-to-end render integration.

The encoding's role-parity target is tcnn GridEncodingTemplated
(grid.h:139-311); its layout is TPU-specific (one gather descriptor per
sample-level), so correctness is checked against a direct NumPy oracle of
its own definition plus packed-vs-unpacked consistency.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.encodings.factory import create_encoding
from nerf_tpu.encodings.tpugrid import _PRIMES, TpuGridEncoding

HASHED_CFG = {"otype": "TpuGrid", "n_levels": 6, "n_features_per_level": 2,
              "log2_rows": 8, "base_resolution": 16, "per_level_scale": 1.5}
# log2_rows 12 makes the coarse levels dense (8^3=512 bricks <= 4096 rows)
MIXED_CFG = {"otype": "TpuGrid", "n_levels": 6, "n_features_per_level": 2,
             "log2_rows": 12, "base_resolution": 16, "per_level_scale": 1.5}
# 4^3-brick quality configuration (125-cell rows, scripts/bench_brick4.py)
BRICK4_CFG = {"otype": "TpuGrid", "n_levels": 6, "n_features_per_level": 2,
              "log2_rows": 8, "base_resolution": 16, "per_level_scale": 1.5,
              "brick_w": 4}


def _oracle(enc: TpuGridEncoding, params, x_cf):
    F = enc.n_features_per_level
    bw, nbs = enc.brick_w, enc.nb_side
    shift = bw.bit_length() - 1
    tab = np.asarray(params).reshape(enc.total_rows, enc.ncells, F)
    xn = np.asarray(x_cf)
    B = xn.shape[1]
    out = np.zeros((enc.n_levels * F, B), np.float32)
    for lvl in range(enc.n_levels):
        pos = xn * enc._scales[lvl] + 0.5
        cell = np.floor(pos).astype(np.int64)
        frac = (pos - np.floor(pos)).astype(np.float32)
        for bi in range(B):
            c = cell[:, bi]
            brick = c >> shift
            off = c & (bw - 1)
            if enc._dense[lvl]:
                nb = int(enc._nbricks[lvl])
                row = (brick[0] * nb + brick[1]) * nb + brick[2]
            else:
                h = ((np.uint32(brick[0]) * np.uint32(_PRIMES[0]))
                     ^ (np.uint32(brick[1]) * np.uint32(_PRIMES[1]))
                     ^ (np.uint32(brick[2]) * np.uint32(_PRIMES[2])))
                row = int(h & np.uint32(enc._rows[lvl] - 1))
            row += int(enc._offsets[lvl])
            for f in range(F):
                acc = 0.0
                for i in (0, 1):
                    for j in (0, 1):
                        for k in (0, 1):
                            col = (((off[0] + i) * nbs + off[1] + j) * nbs
                                   + off[2] + k)
                            w = ((frac[0, bi] if i else 1 - frac[0, bi])
                                 * (frac[1, bi] if j else 1 - frac[1, bi])
                                 * (frac[2, bi] if k else 1 - frac[2, bi]))
                            acc += w * tab[row, col, f]
                out[lvl * F + f, bi] = acc
    return out


@pytest.mark.parametrize("cfg", [HASHED_CFG, MIXED_CFG, BRICK4_CFG])
def test_matches_numpy_oracle(cfg):
    enc = create_encoding(3, cfg)
    assert isinstance(enc, TpuGridEncoding)
    if cfg is MIXED_CFG:
        assert enc._dense[0] and not enc._dense[-1]
    params = enc.init_params(jax.random.PRNGKey(1)) * 1000.0
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 61))
    enc.packed_gather = False
    y = np.asarray(enc._encode_cf(params, x))
    np.testing.assert_allclose(y, _oracle(enc, params, x), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("cfg", [HASHED_CFG, BRICK4_CFG])
def test_packed_matches_unpacked(cfg):
    enc = create_encoding(3, cfg)
    params = enc.init_params(jax.random.PRNGKey(1)) * 1000.0
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 97))
    enc.packed_gather = False
    y_f32 = np.asarray(enc._encode_cf(params, x))
    enc.packed_gather = True
    y_bf16 = np.asarray(enc._encode_cf(params, x))
    scale = np.max(np.abs(y_f32)) + 1e-9
    assert np.max(np.abs(y_f32 - y_bf16)) / scale < 0.01


def test_gradients_flow_unpacked():
    enc = create_encoding(3, HASHED_CFG)
    enc.packed_gather = False
    params = enc.init_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 64))
    g = jax.grad(lambda p: jnp.sum(enc._encode_cf(p, x) ** 2))(params)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_channels_last_wrapper():
    enc = create_encoding(3, HASHED_CFG)
    enc.packed_gather = False
    params = enc.init_params(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 7, 3))
    y = enc.apply(params, x)
    assert y.shape == (5, 7, enc.padded_output_dim)
    y_cf = enc.apply_cf(params, x.reshape(-1, 3).T)
    np.testing.assert_allclose(np.asarray(y).reshape(35, -1),
                               np.asarray(y_cf).T, rtol=1e-6, atol=1e-6)


def test_full_network_and_render():
    """NerfNetwork with TpuGrid position encoding renders end-to-end."""
    from nerf_tpu.core.snapshot import make_synthetic_snapshot
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.render.engine import NerfRender

    cfg = {
        "encoding": {"otype": "TpuGrid", "n_levels": 8,
                     "n_features_per_level": 2, "log2_rows": 9,
                     "base_resolution": 16},
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 1},
        "dir_encoding": {"otype": "SphericalHarmonics", "degree": 4},
        "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                        "output_activation": "None", "n_neurons": 64,
                        "n_hidden_layers": 2},
    }
    snap = make_synthetic_snapshot(seed=3, grid_h=32, network_config=cfg)
    eng = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng.load_from_snapshot(snap)
    eng.set_resolution((16, 16))
    cam = Camera(fl_x=30.0, fl_y=30.0, cx=8.0, cy=8.0)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 6],
                     [0, 0, 0, 1]], np.float32)
    rgb, depth, wsum = eng.render_frame_arrays(cam, pose)
    rgb = np.asarray(rgb)
    wsum = np.asarray(wsum).reshape(16, 16)
    assert np.isfinite(rgb).all()
    assert wsum[8, 8] > 1e-3      # center hits the occupied sphere
    assert abs(wsum[0, 0]) < 1e-6  # corner misses


def test_train_step_with_tpugrid():
    """Gradient-based training works through the TpuGrid f32 path."""
    from nerf_tpu.core.types import RenderSettings
    from nerf_tpu.models.nerf import build_nerf_network
    from nerf_tpu.train.trainer import Trainer

    cfg = {
        "encoding": {"otype": "TpuGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_rows": 7,
                     "base_resolution": 16},
        "network": {"otype": "CutlassMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 16,
                    "n_hidden_layers": 1},
        "dir_encoding": {"otype": "SphericalHarmonics", "degree": 2},
        "rgb_network": {"otype": "CutlassMLP", "activation": "ReLU",
                        "output_activation": "None", "n_neurons": 16,
                        "n_hidden_layers": 1},
    }
    net = build_nerf_network(cfg, bound=1.0)
    assert net.pos_encoding.packed_gather  # default on
    trainer = Trainer(net, RenderSettings(), n_samples=8)
    assert not net.pos_encoding.packed_gather  # trainer forces f32 path
    params = net.init_params()
    opt_state, ema = trainer.init_state(params)
    n = 16
    batch = (jnp.zeros((n, 3)) - 2.0,
             jnp.tile(jnp.asarray([[0.577, 0.577, 0.577]]), (n, 1)),
             jnp.full((n,), 0.2), jnp.full((n,), 4.0),
             jnp.ones((n, 3)))
    p0 = params["pos_encoding"]
    params, opt_state, ema, loss = trainer.step(
        params, opt_state, ema, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert float(jnp.max(jnp.abs(params["pos_encoding"] - p0))) > 0


def test_packed_f4_matches_f32_path():
    """F=4 packed rows (54 u32 bf16 pairs, padded to 64): half the
    descriptors of the 16-level F=2 flagship at equal output width."""
    enc = TpuGridEncoding(3, {"n_levels": 4, "n_features_per_level": 4,
                              "log2_rows": 8, "base_resolution": 16,
                              "packed_gather": True})
    params = enc.init_params(jax.random.PRNGKey(1)) * 100.0
    x = jax.random.uniform(jax.random.PRNGKey(3), (3, 511), jnp.float32)
    enc.packed_gather = False
    ref = np.asarray(enc.apply_cf(params, x))
    enc.packed_gather = True
    prep = enc.prepare_params(params)
    assert "ptable" in prep and prep["ptable"].shape[1] == 64
    out = np.asarray(enc.apply_cf(prep, x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.01, rel  # bf16 storage rounding only


def test_int8_rows_match_f32_path():
    """int8 + per-row bf16 scale rows (16 u32): the w=16 gather class —
    142M rows/s and 4x fewer bytes than the 64-u32 bf16 row."""
    enc = TpuGridEncoding(3, {"n_levels": 4, "n_features_per_level": 2,
                              "log2_rows": 8, "base_resolution": 16,
                              "packed_gather": True, "row_quant": "int8"})
    params = enc.init_params(jax.random.PRNGKey(2)) * 100.0
    x = jax.random.uniform(jax.random.PRNGKey(4), (3, 511), jnp.float32)
    enc.packed_gather = False
    ref = np.asarray(enc.apply_cf(params, x))
    enc.packed_gather = True
    prep = enc.prepare_params(params)
    assert "qtable" in prep and prep["qtable"].shape[1] == 16
    out = np.asarray(enc.apply_cf(prep, x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel  # int8 quantization, per-row scaled


def test_host_pack_bit_identical_to_device_pack():
    """prepare_params packs on the HOST (the device-side [R, ncells, F]
    intermediate tiles at (8,128) — a 59x write amplification that OOMs
    43 GB at log2_rows=18, BASELINE r4); ml_dtypes bfloat16 must round
    exactly like XLA's convert so the packed tables stay bit-equal."""
    for cfg in (HASHED_CFG, BRICK4_CFG,
                {**HASHED_CFG, "n_features_per_level": 4}):
        enc = create_encoding(3, cfg)
        p = enc.init_params(jax.random.PRNGKey(0)) * 100.0
        dev = np.asarray(enc._pack_table(p))
        host = enc._pack_table_np(p)
        np.testing.assert_array_equal(dev, host)
