"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a host-platform mesh instead (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# VORBIS_TPU_TESTS=1 keeps the real accelerator visible so the
# TPU-gated tests (e.g. the Mosaic-compiled Pallas floor-fit identity
# assertion) run on hardware:
#   VORBIS_TPU_TESTS=1 pytest tests/test_floor_device.py -k on_tpu
if not os.environ.get("VORBIS_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The environment's sitecustomize imports jax and registers the
    # TPU plugin before conftest runs, so the env var alone is too
    # late — force the platform through the live config as well.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
