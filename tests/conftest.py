"""Test harness config (SURVEY.md §5 item 4).

Tests run on CPU with 8 virtual devices so the sharded (`shard_map`) paths
exercise real collectives without a TPU pod; float64 is enabled for the
1e-6 oracle-parity bar.  Env vars must be set before jax initializes, hence
the top-of-file ordering.
"""

import os

# NOTE: this environment's axon sitecustomize preloads jax with
# JAX_PLATFORMS=axon snapshotted, so plain env vars are too late here; the
# config must be updated through jax.config instead (XLA_FLAGS is still
# honored lazily at backend init).
#
# GPIS_TEST_PLATFORM=tpu switches the suite onto the real chip (no virtual
# devices, no x64 — TPUs have none) for the `-m tpu` compiled-Pallas smoke
# tier; everything else then skips via the device-count guards.
_tpu_tier = os.environ.get("GPIS_TEST_PLATFORM", "") == "tpu"

_flags = os.environ.get("XLA_FLAGS", "")
if not _tpu_tier and "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _tpu_tier:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from gpis_tpu.utils.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
