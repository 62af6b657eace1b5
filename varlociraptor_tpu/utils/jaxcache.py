"""Persistent XLA compilation cache.

First compilation of an engine shape costs seconds on CPU and minutes
through the axon remote-compile tunnel; the persistent cache makes every
later process start warm.  Safe to call multiple times; silently a no-op
when the backend rejects it."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/varlociraptor_tpu/xla")


def enable(cache_dir: str | None = None) -> None:
    try:
        import jax

        d = cache_dir or os.environ.get("VLT_XLA_CACHE_DIR", _DEFAULT_DIR)
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass
