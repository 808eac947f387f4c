import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.core.types import RenderSettings
from nerf_tpu.models.nerf import build_nerf_network
from nerf_tpu.render.density_grid import (
    generate_density_grid,
    lattice_positions,
    mean_density,
)
from tests.test_train import SMALL_CFG


def test_lattice_positions():
    """init_xyzs semantics (render_utils.h:90-106): x-major layout."""
    h = 4
    pos = np.asarray(lattice_positions(h))
    assert pos.shape == (64, 3)
    np.testing.assert_allclose(pos[0], [-1, -1, -1])
    np.testing.assert_allclose(pos[-1], [1, 1, 1])
    # idx 1 increments z
    np.testing.assert_allclose(pos[1], [-1, -1, -1 + 2 / 3], rtol=1e-6)
    # idx h^2 increments x
    np.testing.assert_allclose(pos[16], [-1 + 2 / 3, -1, -1], rtol=1e-6)


def test_generate_density_grid_update():
    net = build_nerf_network(SMALL_CFG, bound=1.0)
    params = net.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(grid_h=8, cascade=2, bound=2.0)
    grid = jnp.full((2 * 8 ** 3,), 0.5, jnp.float32)
    new = generate_density_grid(net, params, grid, s,
                                key=jax.random.PRNGKey(1))
    new = np.asarray(new)
    assert new.shape == (2 * 512,)
    # EMA max rule: never below old * decay
    assert np.all(new >= 0.5 * 0.95 - 1e-6)
    # negative cells stay untouched
    grid2 = grid.at[0].set(-1.0)
    new2 = np.asarray(generate_density_grid(net, params, grid2, s,
                                            key=jax.random.PRNGKey(1)))
    assert new2[0] == -1.0


def test_generate_density_grid_reset():
    net = build_nerf_network(SMALL_CFG, bound=1.0)
    params = net.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(grid_h=8, cascade=1)
    grid = jnp.full((8 ** 3,), 100.0, jnp.float32)
    new = np.asarray(generate_density_grid(net, params, grid, s,
                                           key=jax.random.PRNGKey(1),
                                           reset=True))
    # reset drops the 100s to max(1/64 * decay, fresh density)
    assert np.all(new < 100.0)


def test_mean_density():
    g = jnp.asarray([-1.0, 1.0, 3.0])
    np.testing.assert_allclose(float(mean_density(g)), 2.0)
