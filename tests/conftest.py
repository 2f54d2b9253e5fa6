"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no fake-backend story at all (single GPU, vestigial tests --
/root/reference/unit_tests/path_tracer_test.cu). Here every test runs on CPU
with ``--xla_force_host_platform_device_count=8`` so the sharded (multi-chip)
code paths are exercised without TPU hardware.

This container's sitecustomize imports jax and registers the axon TPU backend
before any conftest runs, so JAX_PLATFORMS in os.environ is already consumed;
we switch platform via jax.config instead (backends initialize lazily, so this
is still early enough), and XLA_FLAGS is read at backend-init time.
"""
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Generated substitute assets (assets/generate.py) are gitignored; regenerate
# them on a fresh checkout so scene-loading tests are self-sufficient.
if not os.path.exists(os.path.join(REPO_ROOT, "assets", "sphere.obj.scene")):
    import subprocess

    subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "assets", "generate.py")],
        check=True,
        cwd=REPO_ROOT,
    )


# This jaxlib's CPU compiler segfaults deterministically once a single
# process accumulates ~170 compiled graphs (reproduced at the suite tail
# regardless of WHICH tests run there; any individual module passes alone).
# Dropping executables between modules keeps the live-graph count far below
# the threshold; modules recompile their own graphs anyway.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
