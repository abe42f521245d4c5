"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since only one physical TPU chip is
reachable in this environment; see SURVEY.md §4.
"""

import os
import sys

# Hard-set (not setdefault): the container environment pins
# JAX_PLATFORMS=axon (single tunneled TPU chip) and registers the axon
# PJRT plugin via sitecustomize when PALLAS_AXON_POOL_IPS is set. Tests
# must run on the local 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The sitecustomize may have imported jax already (registering the axon
# plugin), in which case the env var above is too late — override the
# config directly before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the deep-conv-stack adapt/train programs
# take minutes of XLA CPU compile on this 1-core host; cache hits make
# repeat suite runs (and the driver's dryrun, which shares the cache
# dir) near-instant. Keyed by HLO hash — stale entries are impossible.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
assert jax.devices()[0].platform == "cpu", (
    "Tests must run on the virtual CPU mesh, got "
    f"{jax.devices()[0].platform}")
assert len(jax.devices()) == 8, (
    f"Expected 8 virtual CPU devices, got {len(jax.devices())}")

# The torch reference is an optional golden oracle for parity tests.
REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
