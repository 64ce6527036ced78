import os
import pathlib

# Small fixed-tile sizes so unit-test-sized inputs exercise the multi-tile
# loops and multi-level NTT recursion in ops/tiles.py (prod defaults are
# 2^16 / 2^10 / 2^9; values are bit-identical regardless of tiling).
os.environ.setdefault("DISTAFF_TILE", "256")
os.environ.setdefault("DISTAFF_NTT_LEAF", "16")
os.environ.setdefault("DISTAFF_NTT_BTILE", "8")
os.environ.setdefault("DISTAFF_NTT_CANON_MAX", "64")
os.environ.setdefault("DISTAFF_NTT_CANON_ELEMS", "512")
os.environ.setdefault("DISTAFF_NTT_TGROUP", "4")
os.environ.setdefault("DISTAFF_NTT_TBATCH", "2")
os.environ.setdefault("DISTAFF_MERKLE_SUBTREE", "64")
os.environ.setdefault("DISTAFF_MERKLE_SGROUP", "2")

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware; the real-chip path is covered by bench.py.
# NOTE: the axon TPU plugin in this environment ignores JAX_PLATFORMS, so we
# also pin the default device to CPU programmatically.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# per-machine cache dir: a cache written by a different builder machine can
# SEGV on load (XLA:CPU AOT executables embed host CPU features)
import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from distaff_tpu.jax_setup import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 machine_cache_dir()))
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
