"""Test harness: force an 8-device virtual CPU platform so sharding/collective
tests run without a TPU slice (SURVEY.md §4 — the capability the reference
lacks: "multi-node" CI via xla_force_host_platform_device_count). Pallas
kernels run in interpret mode on CPU (tpumathlib.dx.pallas_utils), so the
same kernel code paths are exercised as on hardware.

Set TPUMATHLIB_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if not os.environ.get("TPUMATHLIB_TEST_TPU"):
    # The axon TPU plugin's sitecustomize overrides jax_platforms at import
    # time; undo it here before any backend is initialized.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    devs = jax.devices()
    n = min(len(devs), 8)
    return jax.sharding.Mesh(np.array(devs[:n]), ("x",))


@pytest.fixture(scope="session")
def mesh2d():
    devs = jax.devices()
    if len(devs) >= 8:
        return jax.sharding.Mesh(np.array(devs[:8]).reshape(4, 2), ("x", "y"))
    return jax.sharding.Mesh(np.array(devs[:1]).reshape(1, 1), ("x", "y"))


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
