"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4).

The image's sitecustomize pre-imports jax and registers the 'axon' TPU plugin
with JAX_PLATFORMS=axon pinned in the environment, so plain env vars are not
enough — we must override via jax.config after import. XLA_FLAGS still works
because the CPU backend initializes lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU aborts a collective rendezvous after 40 s by default (a process-wide
# static read latched by the FIRST collective, so per-jit compiler_options are
# too late once earlier tests have touched the backend). On a loaded 1-core
# host the full-depth dryrun's virtual tp partners can legitimately sit
# unscheduled for minutes — raise the abort here, before jax init.
if "collective_call_terminate_timeout" not in flags:
    flags = (flags +
             " --xla_cpu_collective_call_terminate_timeout_seconds=7200").strip()
os.environ["XLA_FLAGS"] = flags

# Kernel-vs-XLA equivalence tests verify the EXACT math; the default
# approx-reciprocal/single-exp softmax (~1e-4 rel) is bounded separately in
# tests/test_softmax_approx.py, which flips this env per-test.
os.environ.setdefault("STGCMA_EXACT_SOFTMAX", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/stgcma_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
