"""hifiasm-tpu: a TPU-native haplotype-resolved de novo assembler.

A from-scratch re-design of hifiasm's capabilities (chhylp123/hifiasm) for
TPU hardware: batched JAX/XLA array programs and Pallas kernels for the
compute path (minimizer sketching, k-mer indexing, anchor chaining, banded
bit-parallel alignment, consensus), host-side orchestration for I/O and
string-graph pointer-chasing, and jax.sharding meshes for multi-chip scale.

Reference parity targets are cited per-module as ``file:line`` into the
upstream C++ tree (see SURVEY.md).
"""

__version__ = "0.1.0"

import os as _os


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU features.

    XLA:CPU AOT results embed the compile machine's feature set; loading
    them on a host with different features warns about (and risks) SIGILL.
    Keying the persistent cache directory by the feature set means only
    feature-identical hosts share entries — a new machine recompiles
    instead of loading a mismatched AOT blob."""
    import hashlib
    import platform

    feat = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(feat.encode()).hexdigest()[:10]


def _enable_jax_compile_cache() -> None:
    """Persist XLA compilations next to the repo (device kernels take
    minutes to compile on TPU; the cache makes that a one-time cost).
    Entries live under a per-host-feature subdirectory (see
    ``_host_fingerprint``)."""
    try:
        import jax

        root = _os.environ.get(
            "HIFIASM_TPU_JAX_CACHE",
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                          ".jax_cache"))
        cache = _os.path.join(root, "host-" + _host_fingerprint())
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


_enable_jax_compile_cache()


def _enable_memarena() -> None:
    """MAP_SHARED-backed numpy buffers (70x faster first-touch on this
    kernel); opt out with HIFIASM_TPU_NO_MEMARENA=1."""
    if _os.environ.get("HIFIASM_TPU_NO_MEMARENA"):
        return
    try:
        from hifiasm_tpu.native import install_memarena

        install_memarena()
    except Exception:
        pass


_enable_memarena()

from hifiasm_tpu.config import HifiasmConfig  # noqa: F401,E402
