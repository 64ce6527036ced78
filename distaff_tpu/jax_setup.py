"""Process-wide JAX configuration for the proving pipeline.

The persistent compilation cache is load-bearing on TPU: in this deployment
the XLA compile runs on the far side of a network tunnel, so every fresh
kernel compile costs seconds to minutes of round-trip latency while a cache
hit costs milliseconds.  We therefore

- default the cache directory (overridable via JAX_COMPILATION_CACHE_DIR),
- persist *every* compiled executable, including the sub-second eager-mode
  ones jax skips by default (each skipped entry is re-compiled over the
  tunnel in every fresh process - measured at 0.3-1 s per tiny kernel).
"""

import os

_CONFIGURED = False

# Repo-local so the warmed cache survives anything that clears /tmp between
# proving sessions (gitignored).
DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def configure():
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

    # The TPU plugin in this deployment registers its platform regardless of
    # JAX_PLATFORMS, so requesting CPU via the standard env var silently still
    # dispatches to the (slow, tunneled) device.  Honor the request by pinning
    # the default device to CPU programmatically.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        except RuntimeError:  # pragma: no cover
            pass
