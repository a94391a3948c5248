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


def backend_is_cpu() -> bool:
    """True when jitted programs will compile for the CPU backend.

    When ``jax_platforms`` is configured (the axon site hook, or
    :func:`force_platform`) the first entry decides without touching any
    backend. When it is UNSET (a plain box with no accelerator plugin),
    resolve via ``jax.default_backend()`` — an unset string is NOT
    evidence of a non-CPU backend, and mistaking it for one would write
    ISA-specific CPU AOT entries into the shared unkeyed cache dir.
    """
    import jax
    plats = jax.config.jax_platforms
    if plats:
        return plats.split(",")[0].strip() == "cpu"
    return jax.default_backend() == "cpu"


def machine_keyed_cache_dir(base: str = None) -> str:
    """Persistent-compile-cache dir keyed by the host CPU's feature set.

    XLA:CPU AOT cache entries encode ISA features the default cache key
    does not: an entry written on one machine type loads on another with
    a "could lead to SIGILL" warning (observed ahead of the round-2
    dryrun abort, and again when the driver moved hosts mid-round 3).
    Every CPU-backend call site must key its cache dir by the host, so a
    machine change gets a fresh dir instead of a possibly-poisoned
    artifact. TPU-backend caches stay unkeyed — their executables do not
    encode host ISA features, and warm TPU caches are expensive to lose.
    """
    import hashlib
    import os
    import platform as _platform
    if base is None:
        base = "/root" if os.access("/root", os.W_OK) else "/tmp"
    # x86 cpuinfo lists ISA extensions under "flags", aarch64 under
    # "Features" — an empty signature would collapse all hosts of an
    # architecture into one tag, recreating the cross-ISA poisoning
    sig = ""
    try:
        with open("/proc/cpuinfo") as f:
            sig = next((ln for ln in f
                        if ln.startswith(("flags", "Features"))), "")
    except OSError:
        pass
    sig = f"{_platform.machine()}|{sig or _platform.processor()}"
    tag = hashlib.sha256(sig.encode()).hexdigest()[:10]
    return f"{base}/.jax_cache_cpu_{tag}"
