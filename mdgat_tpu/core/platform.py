"""In-process platform forcing.

The axon TPU site hook force-sets ``jax_platforms="axon,cpu"`` before any
user code runs, so the ``JAX_PLATFORMS`` env var is SILENTLY IGNORED
(config beats env). The only reliable override is an in-process config
update plus a backend reset — shared here so every call site (the CLI
``--platform`` flag, ``tests/conftest.py``, the ``__graft_entry__``
dryrun) stays in sync instead of hand-rolling the same dance.
"""

from __future__ import annotations


def force_platform(platform: str) -> None:
    """Select the JAX platform, discarding any initialized backend.

    Must run before the first JAX computation on the old platform's
    backend is relied upon. Raises (loudly) if the backend-reset API
    moves again — a silent no-op here recreates the ignored-env-var trap
    this helper exists to fix.
    """
    import jax
    jax.config.update("jax_platforms", platform)
    from jax.extend.backend import clear_backends
    clear_backends()
