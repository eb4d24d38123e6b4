"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior is tested without TPU hardware via XLA's host-platform
device-count override (the reference has no distributed tests at all; see
SURVEY.md §4 for why the TPU build needs this harness).

Set ``ZIPNN_TPU_TESTS=1`` to skip the CPU forcing and run the
``@pytest.mark.tpu`` suite on real hardware:

    ZIPNN_TPU_TESTS=1 python -m pytest tests -m tpu -q
"""
import os

_ON_HW = os.environ.get("ZIPNN_TPU_TESTS") == "1"

if not _ON_HW:
    # force, not setdefault: the environment may pre-select a hardware
    # platform (e.g. JAX_PLATFORMS=axon for the tunneled TPU) and tests
    # must run on the virtual 8-device CPU mesh regardless.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # a site hook may register a hardware plugin at interpreter start and
    # set jax_platforms programmatically (overriding the env var) — force
    # it back.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
