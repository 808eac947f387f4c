import os

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from nerf_tpu.core.types import RenderSettings
from nerf_tpu.models.nerf import build_nerf_network
from nerf_tpu.train.loss import create_loss
from nerf_tpu.train.optimizer import create_optimizer
from nerf_tpu.train.trainer import Trainer, render_train

SMALL_CFG = {
    "encoding": {"otype": "HashGrid", "n_levels": 4,
                 "n_features_per_level": 2, "log2_hashmap_size": 12,
                 "base_resolution": 8, "per_level_scale": 1.5},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 16,
                "n_hidden_layers": 1},
    "dir_encoding": {"otype": "SphericalHarmonics", "degree": 2},
    "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 16,
                    "n_hidden_layers": 1},
}

BASE_OPT_CFG = {
    "otype": "Ema", "decay": 0.95, "nested": {
        "otype": "ExponentialDecay", "decay_start": 20, "decay_interval": 10,
        "decay_base": 0.33, "nested": {
            "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
            "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6}}}


def test_losses():
    p = jnp.asarray([[1.0, 2.0]])
    t = jnp.asarray([[1.5, 1.0]])
    np.testing.assert_allclose(create_loss({"otype": "L1"})(p, t),
                               [[0.5, 1.0]])
    np.testing.assert_allclose(create_loss({"otype": "L2"})(p, t),
                               [[0.25, 1.0]])
    # Huber with delta=0.1: |d|>delta -> d - delta/2
    np.testing.assert_allclose(create_loss({"otype": "Huber"})(p, t),
                               [[0.45, 0.95]])
    sm = create_loss({"otype": "SMAPE"})(p, t)
    assert np.all(np.asarray(sm) > 0)


def test_optimizer_schedule():
    tx, ema = create_optimizer(BASE_OPT_CFG)
    assert ema == 0.95
    params = {"w": jnp.ones(4)}
    st = tx.init(params)
    upd, _ = tx.update({"w": jnp.ones(4)}, st, params)
    assert np.all(np.isfinite(np.asarray(upd["w"])))


def _batch(n=64):
    rng = np.random.default_rng(0)
    o = np.full((n, 3), -2.0, np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears = np.full(n, 0.5, np.float32)
    fars = np.full(n, 4.0, np.float32)
    target = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (o, d, nears, fars, target))


def test_render_train_shapes_and_bg():
    net = build_nerf_network(SMALL_CFG, bound=1.0)
    params = net.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(grid_h=16)
    o, d, nears, fars, _ = _batch(8)
    rgb, depth, wsum = render_train(net, params, o, d, nears, fars, s,
                                    n_samples=32)
    assert rgb.shape == (8, 3) and depth.shape == (8,)
    # empty grid -> background only
    grid = jnp.zeros((16 ** 3,), jnp.float32)
    rgb0, _, w0 = render_train(net, params, o, d, nears, fars, s,
                               n_samples=32, density_grid=grid)
    np.testing.assert_allclose(np.asarray(w0), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb0), 1.0, atol=1e-6)


def test_training_reduces_loss():
    net = build_nerf_network(SMALL_CFG, bound=1.0)
    params = net.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(grid_h=16)
    trainer = Trainer(net, s, loss_config={"otype": "Huber"},
                      optimizer_config=BASE_OPT_CFG, n_samples=32)
    opt_state, ema = trainer.init_state(params)
    batch = _batch(128)
    losses = []
    for i in range(20):
        params, opt_state, ema, loss = trainer.step(
            params, opt_state, ema, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_graft_entry_single_chip():
    # Runs in a FRESH interpreter (like the driver's own compile check):
    # jitting the full 16-level flagship forward inside a process that
    # already compiled ~70 tests' programs segfaults XLA:CPU
    # reproducibly (allocator state, not model code — the same jit
    # passes in isolation and in small combinations).
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, {repo!r});\n"
        "import jax, numpy as np\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as ge\n"
        "fn, args = ge.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (1024, 4)\n"
        "assert np.all(np.isfinite(np.asarray(out)))\n"
    ).format(repo=REPO)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               _NERF_TPU_MULTICHIP_CHILD="")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO)
    assert r.returncode == 0


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
