"""Test harness setup: force the CPU backend with a virtual 8-device mesh
BEFORE jax is imported, so sharding tests run without TPU hardware."""

import os

# Unconditional: the ambient environment may point JAX_PLATFORMS at the
# real TPU tunnel (and a site hook may re-register it at import time);
# tests must run on the virtual CPU mesh, so force it both through the
# environment and through jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tests import fixtures  # noqa: E402


@pytest.fixture(scope="session")
def johnson_code():
    """The 6-bit toy code from Johnson, 'Introducing LDPC Codes', ex. 2.5."""
    from qkd_ldpc_tpu.codes import from_dense

    return from_dense(np.array(fixtures.H_JOHNSON), name="johnson-6")


@pytest.fixture(scope="session")
def hamming_code():
    from qkd_ldpc_tpu.codes import from_dense

    return from_dense(np.array(fixtures.H_HAMMING74), name="hamming-7-4")


@pytest.fixture(scope="session")
def n10_code():
    from qkd_ldpc_tpu.codes import from_dense

    return from_dense(np.array(fixtures.H_N10), name="n10")


@pytest.fixture(scope="session")
def medium_code():
    """A mid-size random irregular code for statistical tests (fast on CPU)."""
    from qkd_ldpc_tpu.codes import make_code

    return make_code(n=512, m=262, dv=3, seed=7, name="n512")
