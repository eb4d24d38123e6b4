"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior is tested without TPU hardware via XLA's host-platform
device-count override (the reference has no distributed tests at all; see
SURVEY.md §4 for why the TPU build needs this harness).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
