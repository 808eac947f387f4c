"""Multi-host helpers exercised on the virtual 8-device CPU mesh.

The reference has no multi-node story (SURVEY.md section 2.5); these
helpers are the DCN scale-out path. Single-process here, so
make_array_from_process_local_data is fed the full global batch — the
same call sites work per-host in a real multi-process job.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.parallel import multihost


def test_global_ray_mesh_spans_all_devices():
    mesh = multihost.global_ray_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("rays",)


def test_local_batch_to_global_shards_batch():
    mesh = multihost.global_ray_mesh()
    n = 64
    batch = {
        "rays_o": np.arange(n * 3, dtype=np.float32).reshape(n, 3),
        "rgb": np.ones((n, 3), np.float32),
    }
    g = multihost.local_batch_to_global(batch, mesh)
    for k, v in g.items():
        assert v.shape == batch[k].shape
        np.testing.assert_array_equal(np.asarray(v), batch[k])
        # sharded over the ray axis: each device holds n/8 rows
        shard_shapes = {s.data.shape for s in v.addressable_shards}
        assert shard_shapes == {(n // 8, 3)}, (k, shard_shapes)


def test_train_step_on_global_batch():
    """A dp training step consumes the globally-sharded batch (XLA inserts
    the grad all-reduce; on one host it runs over the virtual mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_tpu.core.types import RenderSettings
    from nerf_tpu.models.nerf import build_nerf_network
    from nerf_tpu.train.trainer import Trainer

    cfg = {
        "encoding": {"otype": "HashGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_hashmap_size": 10,
                     "base_resolution": 16},
        "network": {"otype": "CutlassMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 16,
                    "n_hidden_layers": 1},
        "dir_encoding": {"otype": "SphericalHarmonics", "degree": 2},
        "rgb_network": {"otype": "CutlassMLP", "activation": "ReLU",
                        "output_activation": "None", "n_neurons": 16,
                        "n_hidden_layers": 1},
    }
    mesh = multihost.global_ray_mesh()
    net = build_nerf_network(cfg, bound=1.0)
    trainer = Trainer(net, RenderSettings(), n_samples=4)
    params = jax.device_put(net.init_params(), NamedSharding(mesh, P()))
    opt_state, ema = trainer.init_state(params)

    n = 32
    batch_np = (np.zeros((n, 3), np.float32) - 2.0,
                np.tile(np.asarray([[0.577, 0.577, 0.577]], np.float32),
                        (n, 1)),
                np.full((n,), 0.2, np.float32),
                np.full((n,), 4.0, np.float32),
                np.ones((n, 3), np.float32))
    batch = multihost.local_batch_to_global(tuple(batch_np), mesh)
    params, opt_state, ema, loss = trainer.step(
        params, opt_state, ema, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_initialize_explicit_failure_raises():
    with pytest.raises(Exception):
        multihost.initialize(coordinator_address="127.0.0.1:1",
                             num_processes=2, process_id=5)  # bad id


def test_initialize_autodetect_degrades():
    # no cluster env on this box: must warn-and-return-False, not raise
    with pytest.warns(UserWarning):
        ok = multihost.initialize()
    assert ok is False
