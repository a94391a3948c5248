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
    """Persistent-compile-cache dir scoped to THIS host boot.

    XLA:CPU AOT cache entries encode LLVM target features the default
    cache key does not: an entry written on one machine loads on another
    with a "could lead to SIGILL" warning (observed ahead of the round-2
    dryrun abort, again when the driver moved hosts mid-round 3, and —
    decisive for the keying scheme — in the round-4 dryrun, where a
    /proc/cpuinfo-flags hash still collided: the two hosts' cpuinfo flag
    lines were identical but LLVM's *tuning* features differed by
    ``prefer-no-gather``/``prefer-no-scatter``, which depend on CPU
    model + microcode (GDS-mitigation detection), not on cpuinfo flags.
    No user-space signature reliably reproduces LLVM's host-feature
    computation, so the key includes the kernel ``boot_id``: artifacts
    can only ever be reloaded within the same boot of the same machine,
    where the features are identical by construction. The cost is a cold
    dryrun compile (~10 min) once per boot — SIGILL-proof by
    construction beats a warm cross-machine cache. TPU-backend caches
    stay unkeyed — their executables do not encode host ISA features,
    and warm TPU caches are expensive to lose.
    """
    import hashlib
    import os
    import platform as _platform
    if base is None:
        base = "/root" if os.access("/root", os.W_OK) else "/tmp"
    # x86 cpuinfo lists ISA extensions under "flags", aarch64 under
    # "Features"; model name + microcode narrow same-flag hosts. These
    # stay in the signature as forensics/defense-in-depth — boot_id is
    # what makes cross-machine reuse impossible.
    sig_lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(("flags", "Features", "model name",
                                  "microcode", "stepping")):
                    sig_lines.append(ln.strip())
                if len(sig_lines) >= 4:
                    break
    except OSError:
        pass
    boot_id = ""
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot_id = f.read().strip()
    except OSError:
        pass
    sig = "|".join([_platform.machine(), boot_id] +
                   (sig_lines or [_platform.processor()]))
    tag = hashlib.sha256(sig.encode()).hexdigest()[:10]
    path = f"{base}/.jax_cache_cpu_{tag}"
    # Prune sibling dirs from earlier boots — they are pure disk leakage
    # (one full CPU-AOT cache per boot otherwise). Two guards make the
    # prune provably safe rather than "delete every sibling":
    #   (a) only when OUR key includes a real boot_id — if we could not
    #       read it, a same-boot sibling with a different tag may simply
    #       be the process that could, and we cannot tell it from stale;
    #   (b) only siblings last WRITTEN before this boot (mtime < boot
    #       time). A live same-boot cache under a different tag (e.g. a
    #       sandboxed process whose masked /proc yields a boot_id-less
    #       tag) keeps a fresh top-level mtime as the flat cache files
    #       land in it; deleting an in-use cache mid-run would discard
    #       ~10 min of CPU-AOT compiles — the exact waste this keying
    #       exists to prevent, just on the other process.
    if boot_id:
        try:
            import glob
            import shutil
            import time
            with open("/proc/uptime") as f:
                boot_time = time.time() - float(f.read().split()[0])
            for old in glob.glob(f"{base}/.jax_cache_cpu_*"):
                try:
                    stale = os.path.getmtime(old) < boot_time
                except OSError:
                    continue  # vanished concurrently
                if old != path and stale:
                    shutil.rmtree(old, ignore_errors=True)
        except (OSError, ValueError):
            pass
    return path
