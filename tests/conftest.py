"""Test config: force an 8-device CPU mesh so sharding/collective paths run
without TPU hardware (≙ the reference's ability to test everything on one
GPU; multi-chip analogue per SURVEY.md §4).

Set TSQR_TEST_PLATFORM=tpu to run the suite against the real chip instead —
used by the TPU-gated compiled-kernel lane (tests/test_tpu_compiled.py);
CPU-only tests keep passing, the Pallas interpret tests just run slower.
"""

import os

_PLATFORM = os.environ.get("TSQR_TEST_PLATFORM", "cpu")

os.environ["JAX_PLATFORMS"] = _PLATFORM  # env presets axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402  (fp64 goldens use numpy on host; jax stays f32)

# a site hook pre-imports jax before conftest runs, so the env var alone is
# too late — override the already-captured platform via the config API
jax.config.update("jax_platforms", _PLATFORM)
if _PLATFORM == "cpu":
    assert len(jax.devices()) >= 8, (
        "expected 8 forced host devices; got " + str(jax.devices()))
