import os
import sys

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# are exercised without TPU hardware (SURVEY.md §4 test-strategy note).
#
# The ambient environment registers the (single, exclusive) axon TPU tunnel
# via sitecustomize and force-sets jax.config.jax_platforms = "axon,cpu" —
# env vars alone cannot override it, so pin the config after importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
