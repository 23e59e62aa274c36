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
# persistent compilation cache: XLA:CPU conv3d lowering costs ~5s per unique
# shape; caching across test runs cuts the suite from ~27min to ~2min
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
