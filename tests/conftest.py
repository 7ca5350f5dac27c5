"""Test config: run the suite on an 8-virtual-device CPU mesh.

Note: the environment pre-imports jax (sitecustomize) with
JAX_PLATFORMS=axon pointing at a tunneled TPU, so setting env vars here is
not enough — override through jax.config before any backend initializes.
"""

import os

# XLA_FLAGS is read when the CPU client is created (lazily), so this still
# takes effect even though jax is already imported.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is dominated by CPU XLA
# compiles (~15-20 min cold); caching them makes repeat runs and the
# subprocess-spawning tests (multiprocess/launcher/preemption) much
# faster. Keyed by HLO+config, so it is correctness-neutral.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax_compilation")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
