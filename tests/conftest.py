"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed), mirroring how the
reference tests run fully in-process with file sources and null audio sinks
(reference: e2e/e2e_common.py base config, tests/test_runner.h).
Must set the env vars before jax initialises its backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The harness sitecustomize imports jax (pinning JAX_PLATFORMS=axon) before
# conftest runs, so the env var alone is not enough — override the live
# config before any backend is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"

# Build the native runtime library once per session when the toolchain
# is available, so tests/test_native.py exercises the real C++ paths
# instead of skipping (the .so is gitignored; ~2 s incremental build).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_SO = os.path.join(_REPO, "native", "build",
                          "libsdrpp_tpu_native.so")
if not os.path.exists(_NATIVE_SO):
    import shutil
    import subprocess
    if shutil.which("cmake") and shutil.which("ninja"):
        try:
            subprocess.run(
                ["bash", os.path.join(_REPO, "scripts",
                                      "build_native.sh")],
                check=True, capture_output=True, timeout=300)
        except (subprocess.SubprocessError, OSError):
            pass          # tests fall back to their skip condition


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True)
def _f32_handoff():
    """Pin the kernel-to-kernel handoff planes to float32 for the test
    suite: the equality oracles assert bit-level (>70 dB) agreement
    with the chained reference path.  The production default is bf16
    (ops/precision.py); tests/test_bf16_handoff.py covers it."""
    from sdrplusplusbrown_tpu.ops import precision
    prev = precision.get_handoff_name()
    precision.set_handoff_dtype("float32")
    yield
    precision.set_handoff_dtype(prev)
