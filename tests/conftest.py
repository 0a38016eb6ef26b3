"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The CPU backend is the "simulator" analogue of the reference's x86 QNN-HTP
simulator testing path (reference: README.md:120-125) — functionally exact,
slower than the real chip. 8 virtual devices let the sharding/parallel tests
exercise real multi-chip lowering without TPU hardware.

Must set env vars before the first ``import jax`` anywhere in the test
process, hence this lives at the top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("SDTPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
