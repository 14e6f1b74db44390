"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite at all (its CI is a single pyflakes lint —
reference .github/workflows/ci.yml); we design one per SURVEY.md §4.
Distributed paths are exercised without hardware via JAX's host-platform
device-count override — tests must be runnable on any machine.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA compilation on this class of host is slow (~5s per executable); the
# persistent cache makes re-runs fast and CI-friendly.
import jax

# The container's sitecustomize force-registers the axon TPU plugin with
# platform priority over JAX_PLATFORMS; override it explicitly so tests
# always run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import importlib.util


def load_script_module(path, name):
    """Load a task entry-point script (classification/train.py etc.) under a
    unique module name so the task dirs' same-named scripts don't collide."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
