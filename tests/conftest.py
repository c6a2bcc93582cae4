"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# NOTE: in this image a sitecustomize imports jax at interpreter start, so
# env vars are too late — the platform must be forced via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()
# Tests are CPU-only: never route compiles through the axon
# remote-compile helper — with the device tunnel down, compiles that
# reach it hang intermittently (observed round 3).
for _var in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
             "AXON_LOOPBACK_RELAY"):
    os.environ.pop(_var, None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF = "/root/reference"


def ref_path(*parts):
    return os.path.join(REF, *parts)


@pytest.fixture(scope="session")
def yunet_n_pth():
    p = ref_path("weights", "yunet_n.pth")
    if not os.path.exists(p):
        pytest.skip("reference yunet_n.pth not available")
    return p


@pytest.fixture(scope="session")
def yunet_s_pth():
    p = ref_path("weights", "yunet_s.pth")
    if not os.path.exists(p):
        pytest.skip("reference yunet_s.pth not available")
    return p
