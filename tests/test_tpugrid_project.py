"""Brick-boundary projection (TpuGridEncoding.project_shared_cells).

The brick-local table duplicates boundary cells across adjacent rows
(a 3^3 neighborhood of a 2^3 brick shares its boundary planes with up
to 7 neighbors). Projection averages duplicates — after it, every
duplicate agrees exactly, the encoding becomes continuous across brick
faces (the seam source), and projecting twice is a no-op.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.encodings.tpugrid import _N_NEIGHBORHOOD, TpuGridEncoding


def _enc():
    return TpuGridEncoding(3, {
        "otype": "TpuGrid", "n_levels": 4, "n_features_per_level": 2,
        "log2_rows": 10, "base_resolution": 8, "per_level_scale": 2.0,
    })


def test_projection_ties_duplicates_and_is_idempotent():
    enc = _enc()
    params = enc.init_params(jax.random.PRNGKey(1))
    proj = enc.project_shared_cells(params)
    F = enc.n_features_per_level
    table = np.asarray(proj).reshape(enc.total_rows, _N_NEIGHBORHOOD, F)

    for lvl in range(enc.n_levels):
        if not enc._dense[lvl] or int(enc._nbricks[lvl]) < 2:
            continue
        off = int(enc._offsets[lvl])
        rows_lvl = int(enc._rows[lvl])
        keys = enc._share_keys(lvl)
        vals = table[off:off + rows_lvl].reshape(-1, F)
        # every duplicate group agrees exactly
        order = np.argsort(keys, kind="stable")
        ks, vs = keys[order], vals[order]
        group_start = np.r_[True, ks[1:] != ks[:-1]]
        rep = vs[np.maximum.accumulate(np.where(group_start,
                                                np.arange(len(ks)), 0))]
        np.testing.assert_array_equal(vs, rep)

    # idempotent (allclose: the second mean re-averages equal values)
    proj2 = enc.project_shared_cells(proj)
    np.testing.assert_allclose(np.asarray(proj2), np.asarray(proj),
                               rtol=1e-6, atol=1e-7)


def test_projection_makes_encoding_continuous_across_brick_faces():
    """Query the SAME position through two adjacent bricks' rows: after
    projection the brick-face seam vanishes. The encode itself always
    routes a position to one brick, so probe continuity by evaluating
    two positions straddling a brick face epsilon apart — before
    projection they can disagree by O(param scale); after projection
    the gap must shrink to the trilerp's epsilon."""
    enc = _enc()
    key = jax.random.PRNGKey(2)
    # exaggerate duplicate drift: random table, not the tiny init range
    params = jax.random.uniform(key, (enc.n_params,), jnp.float32,
                                -1.0, 1.0)
    # scan a line crossing many brick faces with a step far below the
    # finest cell size: interior adjacent diffs are O(step * Lipschitz),
    # duplicate-drift seams add O(1) jumps on the raw random table
    n = 4096
    xs = jnp.linspace(0.1, 0.9, n)
    pos = jnp.stack([xs, jnp.full((n,), 0.37), jnp.full((n,), 0.53)])

    # only dense levels are projected (hashed levels alias rows, their
    # seams are a capacity artifact, not duplicate drift) — restrict the
    # jump metric to the dense levels' output features (level-major)
    F = enc.n_features_per_level
    n_dense = sum(int(enc._dense[l]) and int(enc._nbricks[l]) >= 2
                  for l in range(enc.n_levels))
    assert n_dense >= 1

    def max_jump(p):
        out = np.asarray(enc.apply_cf(p, pos))[: n_dense * F]
        return np.abs(np.diff(out, axis=1)).max()

    jump_raw = max_jump(params)
    jump_p = max_jump(enc.project_shared_cells(params))
    # projection must remove the dominant (seam) jumps
    assert jump_p < 0.5 * jump_raw, (jump_raw, jump_p)
