import os

# Simulate an 8-device mesh on CPU so multi-chip sharding logic is testable
# on a single host (SURVEY.md section 4 test strategy). The environment pins
# JAX_PLATFORMS=axon (TPU), so force CPU through jax.config, which wins as
# long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
