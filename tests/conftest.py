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
# accumulated tests.  A conftest cannot unload an .so, so re-exec the
# interpreter once without the env var (sys.orig_argv preserves
# `-m pytest ...` exactly).  The exec happens in pytest_configure, NOT
# at module import: during initial-conftest loading pytest's global
# capture has fd 1/2 redirected into temp files, and an exec'd process
# inherits those — every line of suite output would vanish.  By
# pytest_configure the capture is suspended and the real fds restored.
_REEXEC_WITHOUT_PLUGIN = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def pytest_configure(config):
    # Single-process pytest only: an xdist worker re-enters
    # pytest_configure with the MASTER's orig_argv, so execve there would
    # restart the wrong process (and every worker at once).  Workers
    # inherit the already-cleaned env from the re-exec'd master anyway.
    if _REEXEC_WITHOUT_PLUGIN and "PYTEST_XDIST_WORKER" not in os.environ:
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        os.execve(sys.executable, sys.orig_argv, env)


if not _REEXEC_WITHOUT_PLUGIN:
    # Force CPU: the surrounding environment pre-sets JAX_PLATFORMS=axon
    # (the tunnelled TPU), which is slow to compile and has no real
    # float64 — unit and parity tests must run on host CPU in x64.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    # (In a plugin-loaded process the env var alone would not be enough —
    # sitecustomize's registration pre-empts JAX_PLATFORMS — but this
    # branch only runs after the re-exec, where the plugin never loads.)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache: compiles dominate wall-clock on this box.
    # SEPARATE dir from the TPU scripts' /tmp/jax_cache: a CPU suite
    # running concurrently with a TPU batch once died with SIGABRT inside
    # put_executable_and_time when both processes wrote one cache.
    # RTS_TEST_NO_CACHE=1 disables the cache entirely.
    if not os.environ.get("RTS_TEST_NO_CACHE"):
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import pytest

    @pytest.fixture(autouse=True, scope="module")
    def _clear_jax_caches_per_module():
        """The XLA CPU client segfaults after ~160 tests of accumulated
        compilations in one process (r6: SIGSEGV inside
        backend_compile_and_load with the plugin-free re-exec, inside
        executable.serialize() before it — both deep in XLA, both only
        after long accumulation).  Dropping every live executable at
        module boundaries keeps the client's working set bounded; the
        persistent disk cache makes the cross-module recompiles cheap
        deserialisations."""
        yield
        jax.clear_caches()
