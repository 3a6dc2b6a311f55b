"""Authoritative JAX platform pinning, shared by every entry point.

The surrounding environment may export JAX_PLATFORMS pointing at a
tunneled-TPU plugin (e.g. "axon").  The env var alone does not stop
out-of-tree PJRT plugins from merging themselves back in at init — and a
dead tunnel then hangs the process before the first dispatch — so
`jax.config.update("jax_platforms", ...)` after import is the only
authoritative pin (same pattern as tests/conftest.py).

The host "cpu" backend is always kept alongside: parameters are built on
it, and pinning e.g. "axon" alone would unregister it.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("ai2bmd-tpu")


def pin_jax_platforms() -> None:
    """Pin jax_platforms to $JAX_PLATFORMS (+",cpu" if missing); no-op when
    the env var is unset (JAX's own platform autodetection applies)."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    tokens = [p.strip().lower() for p in plats.split(",") if p.strip()]
    if "cpu" not in tokens:
        tokens.append("cpu")
        # widening the user's explicit pin is observable behavior: leave a
        # trace so accidental host fallback stays diagnosable
        log.info(
            "JAX_PLATFORMS=%s lacks the host cpu backend (needed for "
            "param init); effective platform list: %s",
            plats, ",".join(tokens),
        )
    jax.config.update("jax_platforms", ",".join(tokens))
