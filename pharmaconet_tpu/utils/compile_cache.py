"""Persistent XLA compilation cache setup.

The modeling program (64^3 SwinV2-3D + FPN + heads) takes tens of seconds to
compile on a TPU host. The reference amortizes nothing (torch eager); here
every CLI entry point enables JAX's persistent compilation cache so the
second process-level invocation of any program shape is a cache hit.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger("pharmaconet_tpu")

_ENV_DIR = "PMNET_TPU_COMPILE_CACHE"
_DISABLE = "PMNET_TPU_NO_COMPILE_CACHE"


def enable_compile_cache(cache_dir: str | Path | None = None) -> Path | None:
    """Point jax at a persistent compilation cache directory.

    Resolution: explicit arg > $PMNET_TPU_COMPILE_CACHE > ~/.cache/
    pharmaconet_tpu/xla. Set $PMNET_TPU_NO_COMPILE_CACHE=1 to disable.
    Safe to call multiple times; returns the directory or None if disabled.
    """
    honor_env_platforms()
    if os.environ.get(_DISABLE):
        return None
    import jax

    path = Path(
        cache_dir
        or os.environ.get(_ENV_DIR)
        or Path.home() / ".cache" / "pharmaconet_tpu" / "xla"
    )
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError) as e:  # pragma: no cover - env specific
        logger.warning("compile cache unavailable: %s", e)
        return None
    return path


def honor_env_platforms() -> None:
    """Make an explicit $JAX_PLATFORMS env setting actually stick.

    Managed environments may install a sitecustomize that force-registers
    a remote-TPU platform and overwrites jax_platforms (see
    tests/conftest.py) — with the relay down, device init then hangs every
    CLI even when the user pinned JAX_PLATFORMS=cpu. Re-assert the user's
    choice before the first backend initialization. No-op when the env var
    is unset or backends are already live."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception as e:  # pragma: no cover - backends already initialized
        logger.warning("could not re-pin jax_platforms=%s: %s", env, e)
