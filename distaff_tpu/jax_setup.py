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

import hashlib
import os
import platform

_CONFIGURED = False
_DISTRIBUTED = False

# Repo-local so the warmed cache survives anything that clears /tmp between
# proving sessions (gitignored).
DEFAULT_CACHE_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def machine_cache_dir(base=None):
    """Per-machine compilation-cache directory (CPU processes only).

    XLA:CPU AOT executables embed the build host's CPU features; loading an
    entry written by a different machine can execute unsupported
    instructions (observed: SIGSEGV inside the cache read when this repo
    directory moved between builder machines).  Salting the directory with
    a CPU-feature fingerprint makes a foreign cache invisible instead of
    fatal."""
    base = base or DEFAULT_CACHE_BASE
    try:
        with open("/proc/cpuinfo") as fh:
            flags = next((ln for ln in fh if ln.startswith("flags")), "")
    except OSError:  # pragma: no cover - non-Linux
        flags = ""
    fp = hashlib.md5(
        (platform.machine() + flags).encode()).hexdigest()[:10]
    return f"{base}_{fp}"


def tpu_cache_dir(base=None):
    """Unsalted cache directory for TPU processes.

    TPU executables are compiled server-side and are machine-independent,
    so a cache warmed by one build machine must stay visible to the next
    (the machines hosting this repo rotate; a per-machine salt forced every
    fresh machine - including the bench driver's - to re-pay minutes of
    tunneled compiles).  TPU-mode processes never jit on the CPU backend
    (the only CPU-device use, parallel/mesh.py, is for CPU-platform virtual
    meshes), so the CPU-AOT foreign-machine hazard above does not apply."""
    return (base or DEFAULT_CACHE_BASE) + "_tpu"


def initialize_distributed():
    """Multi-host entry point: join a `jax.distributed` job when requested.

    SPMD proving across hosts (reference has no analogue - its concurrency
    stops at crossbeam threads, src/math/parallel.rs) rides the standard JAX
    runtime: every host runs the same prover script, the mesh spans all
    hosts' devices, and XLA routes collectives over ICI within a slice and
    DCN across slices.  Activation, any ONE of:

      DISTAFF_COORDINATOR=host:port  DISTAFF_NUM_PROCESSES=N  DISTAFF_PROCESS_ID=K
        explicit rendezvous (mirrors jax.distributed.initialize arguments)
      DISTAFF_DISTRIBUTED=1
        auto-detection (TPU pod metadata / cluster env), i.e.
        jax.distributed.initialize() with no arguments

    Returns True when distributed mode was initialized."""
    global _DISTRIBUTED
    if _DISTRIBUTED:
        return True
    coord = os.environ.get("DISTAFF_COORDINATOR")
    auto = os.environ.get("DISTAFF_DISTRIBUTED") == "1"
    if not coord and not auto:
        return False
    import jax

    # multi-process CPU (the virtual-mesh validation path) needs a
    # cross-process collectives implementation: without it every process
    # builds a LOCAL cpu client and process_count() stays 1 even though
    # the coordination service is up (observed: two joined processes each
    # reporting "1 process(es)")
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # noqa: BLE001 - older jax: flag absent
            pass

    if coord:
        nproc = os.environ.get("DISTAFF_NUM_PROCESSES")
        pid = os.environ.get("DISTAFF_PROCESS_ID")
        if nproc is None or pid is None:
            raise RuntimeError(
                "DISTAFF_COORDINATOR is set but DISTAFF_NUM_PROCESSES / "
                "DISTAFF_PROCESS_ID are not; all three are required for an "
                "explicit multi-host rendezvous")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid))
    else:
        jax.distributed.initialize()
    # only mark joined once initialize() succeeded - a raise above must
    # leave the next call able to retry rather than report success
    _DISTRIBUTED = True
    return True


def configure():
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True

    initialize_distributed()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        # pick the dir by what the process can COMPILE: the unsalted
        # (machine-portable) dir only when every executable will be a
        # server-side TPU one - no CPU platform request, no virtual CPU
        # devices, and no mesh that could fall back to CPU devices
        # (parallel/mesh.py:49); anything that might emit an XLA:CPU AOT
        # executable uses the CPU-feature-salted dir
        tpu_only = (
            os.environ.get("JAX_PLATFORMS") != "cpu"
            and "xla_force_host_platform_device_count"
            not in os.environ.get("XLA_FLAGS", "")
            and int(os.environ.get("DISTAFF_MESH_DEVICES", "0") or 0) <= 1)
        if tpu_only:
            try:
                tpu_only = jax.default_backend() != "cpu"
            except RuntimeError:  # pragma: no cover - no backend at all
                tpu_only = False
        cache_dir = tpu_cache_dir() if tpu_only else machine_cache_dir()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

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
