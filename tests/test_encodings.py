import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.encodings import (
    CompositeEncoding,
    FrequencyEncoding,
    GridEncoding,
    IdentityEncoding,
    OneBlobEncoding,
    SphericalHarmonicsEncoding,
    create_encoding,
)

BASE_GRID_CFG = {
    "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
    "log2_hashmap_size": 19, "base_resolution": 16,
    "per_level_scale": math.exp(math.log(2048.0 / 16.0) / 15),
}


class TestGrid:
    def test_offset_table_base_config(self):
        """Level sizes must follow grid.h:899-933: min(next_mult(res^3,8), 2^19)."""
        enc = GridEncoding(3, BASE_GRID_CFG, alignment=16)
        log2b = np.float32(math.log2(BASE_GRID_CFG["per_level_scale"]))
        for lvl in range(16):
            scale = float(np.exp2(np.float32(lvl) * log2b) * np.float32(16)
                          - np.float32(1))
            res = int(np.ceil(np.float32(scale))) + 1
            expected = min(((res ** 3 + 7) // 8) * 8, 1 << 19)
            got = int(enc._level_sizes[lvl])
            assert got == expected, (lvl, res, got, expected)
        assert enc.n_params == int(enc._offsets[-1] + enc._level_sizes[-1]) * 2
        # level 0: res 16 -> dense 4096, not hashed
        assert not enc._use_hash[0]
        # finest levels must be hashed at 2^19
        assert enc._use_hash[15]
        assert int(enc._level_sizes[15]) == 1 << 19

    def test_dense_grid_value_at_lattice_point(self):
        """At an exact lattice point the interpolation must return the
        table entry (weight 1 on one corner)."""
        cfg = {"otype": "DenseGrid", "n_levels": 1, "n_features_per_level": 2,
               "base_resolution": 4, "per_level_scale": 1.5}
        enc = GridEncoding(3, cfg)
        res = int(enc._resolutions[0])
        table = np.arange(enc.n_params, dtype=np.float32)
        # scale = res-1 = 3; pos = x*3 + 0.5. Choose x so pos lands exactly
        # on cell centers: x = (k + 0.5)/scale has fract 0? pos = k + 1.0 ->
        # fract 0 at integer pos: x = (k - 0.5)/3 gives pos = k.
        x = jnp.asarray([[0.5 / 3.0, 0.5 / 3.0, 0.5 / 3.0]])  # pos=1.0 each
        out = enc.apply(jnp.asarray(table), x)
        row = 1 + 1 * res + 1 * res * res  # stride-ordered dense index
        np.testing.assert_allclose(out[0, :2], table[2 * row: 2 * row + 2],
                                   rtol=1e-6)

    def test_hash_matches_manual_fast_hash(self):
        cfg = {"otype": "HashGrid", "n_levels": 1, "n_features_per_level": 1,
               "log2_hashmap_size": 4, "base_resolution": 64,
               "per_level_scale": 1.5}
        enc = GridEncoding(3, cfg)
        assert enc._use_hash[0]
        table = np.arange(enc.n_params, dtype=np.float32)
        # integer lattice position -> single corner w=1
        x = np.array([[10.5 / 63.0, 3.5 / 63.0, 7.5 / 63.0]], np.float32)
        pos = x * 63.0 + 0.5
        cell = np.floor(pos).astype(np.uint32)[0]
        h = (cell[0] * np.uint32(1)
             ^ cell[1] * np.uint32(2654435761)
             ^ cell[2] * np.uint32(805459861)) % np.uint32(16)
        out = enc.apply(jnp.asarray(table), jnp.asarray(x))
        frac = pos - np.floor(pos)
        if np.allclose(frac, 0):
            np.testing.assert_allclose(out[0, 0], table[int(h)], rtol=1e-6)

    def test_interpolation_is_convex(self):
        enc = GridEncoding(3, BASE_GRID_CFG, alignment=16)
        params = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, enc.n_params)
            .astype(np.float32))
        x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (64, 3))
                        .astype(np.float32))
        out = enc.apply(params, x)
        assert out.shape == (64, 32)
        assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-5)

    def test_smoothstep_interpolation(self):
        cfg = dict(BASE_GRID_CFG, interpolation="Smoothstep")
        enc = GridEncoding(3, cfg)
        params = enc.init_params(jax.random.PRNGKey(0))
        out = enc.apply(params, jnp.full((4, 3), 0.3))
        assert out.shape == (4, 32)

    def test_packed_gather_close_to_fp32(self):
        """Packed bf16-pair gathers (one uint32 per entry) must match the
        fp32 path to bf16 tolerance."""
        enc = GridEncoding(3, BASE_GRID_CFG, alignment=16)
        params = enc.init_params(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 3))
                        .astype(np.float32))
        ref = np.asarray(enc.apply(params, x))
        enc.packed_gather = True
        got = np.asarray(enc.apply(params, x))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 0.01, err

    def test_tiled_grid(self):
        cfg = {"otype": "TiledGrid", "n_levels": 4, "n_features_per_level": 2,
               "base_resolution": 8, "per_level_scale": 2.0}
        enc = GridEncoding(3, cfg)
        # every level capped at base_res^3 = 512
        assert all(int(sz) <= 512 for sz in enc._level_sizes)
        params = enc.init_params()
        out = enc.apply(params, jnp.full((2, 3), 0.7))
        assert out.shape == (2, 8)


class TestSH:
    def test_degree1_constant(self):
        enc = SphericalHarmonicsEncoding(3, {"degree": 1}, alignment=1)
        out = enc.apply(None, jnp.asarray([[0.3, 0.9, 0.1]]))
        np.testing.assert_allclose(out[0, 0], 0.28209479177387814, rtol=1e-6)

    def test_degree4_known_direction(self):
        """+z direction (input (0.5,0.5,1.0) -> dir (0,0,1)),
        polys from spherical_harmonics.h:77-103."""
        enc = SphericalHarmonicsEncoding(3, {"degree": 4}, alignment=16)
        assert enc.padded_output_dim == 16
        out = np.asarray(enc.apply(None, jnp.asarray([[0.5, 0.5, 1.0]])))[0]
        np.testing.assert_allclose(out[0], 0.28209479177387814, rtol=1e-6)
        np.testing.assert_allclose(out[1], 0.0, atol=1e-6)   # -c*y, y=0
        np.testing.assert_allclose(out[2], 0.48860251190291987, rtol=1e-6)
        np.testing.assert_allclose(out[6], 0.94617469575755997
                                   - 0.31539156525251999, rtol=1e-6)
        np.testing.assert_allclose(out[12], 0.3731763325901154 * 2.0,
                                   rtol=1e-6)  # z*(5z^2-3) = 2

    def test_padding_is_one_and_leading(self):
        enc = SphericalHarmonicsEncoding(3, {"degree": 2}, alignment=8)
        # 4 outputs padded to 8; tcnn writes pad FIRST (sh.h:59-64)
        out = np.asarray(enc.apply(None, jnp.asarray([[0.1, 0.2, 0.3]])))[0]
        assert out.shape == (8,)
        np.testing.assert_allclose(out[:4], 1.0)
        np.testing.assert_allclose(out[4], 0.28209479177387814, rtol=1e-6)


class TestBasic:
    def test_identity(self):
        enc = IdentityEncoding(3, {"scale": 2.0, "offset": 1.0}, alignment=4)
        out = np.asarray(enc.apply(None, jnp.asarray([[1.0, 2.0, 3.0]])))[0]
        np.testing.assert_allclose(out, [3.0, 5.0, 7.0, 1.0])

    def test_frequency_order(self):
        enc = FrequencyEncoding(1, {"n_frequencies": 2}, alignment=1)
        out = np.asarray(enc.apply(None, jnp.asarray([[0.25]])))[0]
        # sin(pi/4), cos(pi/4), sin(pi/2), cos(pi/2)
        np.testing.assert_allclose(
            out, [math.sin(math.pi / 4), math.cos(math.pi / 4), 1.0, 0.0],
            atol=1e-6)

    def test_oneblob_mass(self):
        enc = OneBlobEncoding(1, {"n_bins": 8})
        out = np.asarray(enc.apply(None, jnp.asarray([[0.37]])))[0]
        assert out.shape == (8,)
        # kernel integrates to ~1 over the wrapped domain
        np.testing.assert_allclose(out.sum(), 1.0, atol=1e-3)
        assert out.argmax() == int(0.37 * 8)

    def test_trianglewave(self):
        enc = create_encoding(1, {"otype": "TriangleWave",
                                  "n_frequencies": 3}, alignment=1)
        out = enc.apply(None, jnp.asarray([[0.25]]))
        assert out.shape == (1, 3)


class TestComposite:
    def test_base_dir_encoding_reduces_to_sh(self):
        cfg = {"otype": "Composite", "nested": [
            {"n_dims_to_encode": 3, "otype": "SphericalHarmonics",
             "degree": 4},
            {"otype": "Identity", "n_bins": 4, "degree": 4},
        ]}
        comp = CompositeEncoding(3, cfg, alignment=16)
        assert comp.padded_output_dim == 16
        assert len(comp.nested) == 1  # zero-dim Identity dropped
        sh = SphericalHarmonicsEncoding(3, {"degree": 4}, alignment=16)
        x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (8, 3))
                        .astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(comp.apply(comp.init_params(), x)),
            np.asarray(sh.apply(None, x)), rtol=1e-6)

    def test_split_dims(self):
        cfg = {"otype": "Composite", "nested": [
            {"n_dims_to_encode": 2, "otype": "Identity"},
            {"otype": "Frequency", "n_frequencies": 2},
        ]}
        comp = CompositeEncoding(4, cfg, alignment=1)
        x = jnp.asarray([[0.1, 0.2, 0.25, 0.5]])
        out = np.asarray(comp.apply(comp.init_params(), x))[0]
        np.testing.assert_allclose(out[:2], [0.1, 0.2], atol=1e-6)
        # remaining dims (0.25, 0.5) frequency encoded
        assert out.shape[0] == 2 + 2 * 2 * 2

    def test_overclaim_raises(self):
        with pytest.raises(ValueError):
            CompositeEncoding(2, {"otype": "Composite", "nested": [
                {"n_dims_to_encode": 3, "otype": "Identity"}]})
