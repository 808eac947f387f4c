"""Test config: force CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (SURVEY.md section 4).

Note: the environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon, so env vars alone are too late — we must also
update jax.config before any backend is instantiated.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The merged round programs (march+eval+composite in one jit,
# render/march.py) cost 15-30s EACH to compile on CPU; the committed
# persistent cache makes repeat suite runs near-instant (same mechanism
# bench.py uses for the remote TPU compiles).
from nerf_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_cache"))


# One process compiling all ~140 tests' programs accumulates enough
# executable/buffer state to crash XLA:CPU near the end of the suite
# (reproduced twice: SIGSEGV jitting the flagship forward at test ~70,
# SIGABRT in a cache read at test ~135; each crash site passes alone
# and in small combinations). Dropping the jit caches between modules
# bounds live state; the persistent on-disk cache makes the re-loads
# cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
