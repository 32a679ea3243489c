"""Persistent XLA compilation cache.

On this hardware a compile round-trips a remote compile service (40-90s
per kernel shape); caching executables on disk makes every run after the
first start in seconds. Safe no-op if the backend doesn't support it.
"""
from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    _enabled = True
    if cache_dir is None:
        cache_dir = os.environ.get("BPT_JAX_CACHE")
    if cache_dir is None:
        # Segregate by platform: CPU-context entries (tests, dry-runs,
        # fallbacks) must never mix with the tunneled-TPU entries — a
        # shared dir has produced corrupted/mismatched AOT entries that
        # SIGSEGV'd the cpu_aot_loader on read. The legacy unsuffixed dir
        # stays for the TPU platform (its entries cost 40-90 s each to
        # recompile through the remote compile service).
        suffix = "-cpu" if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu" else ""
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "baby_plonk_tpu", "xla" + suffix
        )
    if cache_dir.lower() in ("off", "none", "0"):
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
