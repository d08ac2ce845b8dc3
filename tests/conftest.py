"""Test configuration: force the JAX CPU backend with a virtual 8-device mesh.

The container's sitecustomize pins ``JAX_PLATFORMS=axon`` (a single tunneled
TPU chip); unit tests must be deterministic and mesh-capable, so we override to
CPU with 8 virtual devices (SURVEY.md §4: multi-chip tests runnable on CPU via
``xla_force_host_platform_device_count``).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE, *parts)


needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not mounted"
)
