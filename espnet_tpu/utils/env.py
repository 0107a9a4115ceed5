"""Runtime environment helpers."""
from __future__ import annotations

import os


def apply_jax_platform_env():
    """Make the JAX_PLATFORMS env var authoritative.

    Session environments may register PJRT plugins that override platform
    selection programmatically (e.g. remote-TPU plugins setting
    jax_platforms after import); an explicit env var from the user must
    win — call this at every CLI entry point before touching jax.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
