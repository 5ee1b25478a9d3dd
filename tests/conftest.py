"""Test harness config: run JAX on CPU with float64 enabled and 8 virtual
devices so multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 item 4)."""

import os
import sys

# The axon PJRT plugin .so is loaded into EVERY python process at
# interpreter startup (/root/.axon_site/sitecustomize.py) whenever
# PALLAS_AXON_POOL_IPS is set — including CPU-only test runs, where its
# native threads share the heap with the XLA CPU client.  The full suite
# reproducibly died with SIGSEGV/SIGABRT (inside executable.serialize()
# with the compile cache on, elsewhere with it off) after ~160
# accumulated tests, and only in plugin-loaded processes.  A conftest
# cannot unload an .so, so re-exec the interpreter once without the env
# var (sys.orig_argv preserves `-m pytest ...` exactly); the re-exec'd
# process skips plugin registration entirely and the branch below is
# not taken again.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable, sys.orig_argv, env)

# Force CPU: the surrounding environment pre-sets JAX_PLATFORMS=axon (the
# tunnelled TPU), which is slow to compile and has no real float64 — unit
# and parity tests must run on host CPU in x64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is NOT enough here: /root/.axon_site/sitecustomize.py
# registers the axon TPU plugin at interpreter startup, which pre-empts
# JAX_PLATFORMS.  The config update below reliably forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: compiles dominate wall-clock on this box.
# SEPARATE dir from the TPU scripts' /tmp/jax_cache: a CPU suite running
# concurrently with a TPU batch once died with SIGABRT inside
# put_executable_and_time when both processes wrote one cache.
# RTS_TEST_NO_CACHE=1 disables the cache entirely — the full suite has
# crashed (SIGSEGV/SIGABRT) inside put_executable_and_time at the same
# test in several runs; the kill switch isolates the cache writes.
if not os.environ.get("RTS_TEST_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
