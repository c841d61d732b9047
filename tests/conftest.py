"""Test config: force an 8-device virtual CPU mesh before JAX backends init.

Multi-chip sharding tests run on virtual CPU devices — the standard way to
test shard_map/pjit layouts without a TPU pod (SURVEY.md §4).

Environment subtleties (see .claude/skills/verify/SKILL.md):
- The host pins JAX_PLATFORMS=axon (real TPU tunnel) and a sitecustomize
  imports jax at interpreter start, so jax's config has already captured
  "axon" by the time this conftest runs. Setting os.environ here is NOT
  enough — we must update the live jax config. Backends are still
  uninitialized at conftest time, so the update takes effect.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: model compiles on 1 CPU core are minutes;
# cache them across test runs (dir is gitignored).
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))

_devs = jax.devices()
assert _devs[0].platform == "cpu", f"tests must run on CPU, got {_devs}"
assert len(_devs) == 8, f"expected 8 virtual CPU devices, got {len(_devs)}"
