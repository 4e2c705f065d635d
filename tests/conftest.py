"""Test harness: run everything on a virtual 8-device CPU mesh.

Hardware-free testing is the analog of the reference's sw_emu/hw_emu +
LOCAL_BLAZE flows (SURVEY.md §4): kernels and the multi-chip sharding path
are validated on host CPU devices; the real chip is only needed for bench.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NOTE: the JAX_PLATFORMS env var is not honoured in this environment (the
# axon TPU plugin still wins); the config route works and avoids touching
# the TPU tunnel from unit tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the big state-machine/interpret bodies
# cost 20-120 s each to compile on this 1-core box; repeat suite runs
# (same shapes) hit the cache instead.  Repo-local + gitignored.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # older jax without these knobs: compile as before
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (daemon subprocess, heavy interpret runs)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (daemon CLI, multiprocess, heavy interpret);"
        " excluded by default, enable with --runslow or RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
