"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip sharding
paths compile and execute without TPU hardware.  The image pre-sets
JAX_PLATFORMS=axon (the TPU tunnel) and its plugin force-registers as the
default backend, so the override must go through jax.config, before any
computation runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SWIFTVIDEO_TPU_TESTS"):
    # opportunistic hardware mode: leave the platform alone so
    # tests/test_tpu_parity.py runs the kernel sweep on the real chip
    import jax  # noqa: E402
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

# Build the native shims on a fresh checkout (the .so files are
# gitignored).  Failures are non-fatal: every native path has a tested
# Python fallback and the libav suite skips itself when the shim is
# absent — this hook just keeps that coverage ON wherever a compiler
# and the system libav exist.
_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")
if not all(os.path.exists(os.path.join(_CSRC, so))
           for so in ("libsvbitstream.so", "libsvrtmp.so", "libsvav.so")):
    import subprocess
    try:
        subprocess.run(["make", "-C", _CSRC], timeout=120,
                       capture_output=True, check=False)
    except Exception:  # noqa: BLE001
        pass
