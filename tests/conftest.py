"""Test configuration: run everything on local CPU with 8 virtual devices
so sharding/pjit paths are exercised without TPU hardware (mirrors the
reference's gloo-backend distributed tests,
test/espnet2/train/test_distributed_utils.py).

The session environment registers a remote-TPU PJRT plugin ("axon") from
sitecustomize and forces jax_platforms to it programmatically, so we must
both set XLA_FLAGS before backends exist and override the jax config
after import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
