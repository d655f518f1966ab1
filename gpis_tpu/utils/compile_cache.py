"""Persistent compile cache for every gpis-tpu entry point.

The axon tunnel's remote Mosaic compiles cost minutes when the REMOTE
cache is cold (docs/PERF.md; measured 2026-08-20: a cold headline bench
pays ~200 s of compile, the compiled smoke tier 7:40).  The remote cache
goes cold every time the tunnel/remote restarts — which it does repeatedly
per round (wedges, RESOURCE_EXHAUSTED kills, container restarts).  JAX's
persistent compilation cache stores the serialized executable (the full
TPU binary — verified: axon's client reports platform "tpu" and supports
executable serialization; cross-process cache hits load and run) keyed by
the HLO fingerprint, so once any process has compiled a kernel, later
processes — including after a remote restart, since the cache dir lives on
the client — skip the remote compile entirely.  Backends that cannot
serialize executables make the cache a silent no-op, so enabling is always
safe.  Scope note: the driver re-materializes /root at container restart,
so ~/.cache does NOT outlive the container; the win is every process after
the first within a container lifetime, and especially tunnel restarts
mid-session.

Opt out with ``GPIS_COMPILE_CACHE=0``; override the location with
``JAX_COMPILATION_CACHE_DIR`` (respected by JAX itself) or
``GPIS_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

__all__ = ["enable", "guard_cpu_backend"]

_DONE = False


def enable() -> None:
    """Idempotently point JAX's persistent compilation cache at a durable
    directory.  Must run before the first compile it should serve; entry
    points call it at import time, which is always early enough."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    if os.environ.get("GPIS_COMPILE_CACHE", "1") == "0":
        return
    path = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.environ.get("GPIS_COMPILE_CACHE_DIR")
        or os.path.expanduser("~/.cache/gpis_tpu_jax")
    )
    try:
        import jax

        # CPU stays uncached: XLA:CPU AOT reloads warn about machine-feature
        # mismatches ("could lead to SIGILL") and the container can migrate
        # hosts between sessions, making stale CPU executables genuinely
        # unsafe.  Reading the config does NOT initialize a backend (a
        # `jax.default_backend()` probe here would claim the tunnel at
        # import time), so this only catches callers that pinned the
        # platform before enabling — exactly the CI conftest.  Only the
        # FIRST platform counts: this environment's sitecustomize pins
        # "axon,cpu" (cpu as fallback), which must stay cached.
        plats = (getattr(jax.config, "jax_platforms", "") or "").split(",")
        if plats[0].strip() == "cpu":
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # 0.1 s threshold ON PURPOSE: when the remote Mosaic cache is warm
        # the client-measured compile of a real kernel is only ~0.5-2 s, but
        # its serialized executable is the full TPU binary — capturing it
        # means a later tunnel/remote restart (which resets the remote
        # cache) is served from this local cache instead of repaying the
        # ~200 s cold headline compile / ~8 min smoke tier.  Only trivial
        # sub-0.1 s executables are skipped.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception as e:  # never let cache plumbing break an entry point
        try:
            from gpis_tpu.utils.logging import get_logger

            get_logger("compile_cache").warning(
                "persistent compile cache disabled: %s", e)
        except Exception:
            pass


def guard_cpu_backend() -> None:
    """Lazy CPU guard, called once a live backend exists (session.start,
    bench warm-up).  `enable()` can only inspect the CONFIGURED first
    platform — it must not initialize a backend at import time — so a
    process whose axon init fails and falls back to CPU (jax_platforms
    "axon,cpu"), or that pins cpu after importing the library, would
    otherwise cache CPU executables: exactly the case XLA:CPU's AOT reload
    warns may SIGILL if GPIS_COMPILE_CACHE_DIR/JAX_COMPILATION_CACHE_DIR
    points at storage shared across hosts.  By the time any caller is
    fitting, the backend is initialized anyway, so this check is free."""
    if not _DONE:
        return
    try:
        import jax

        if (jax.default_backend() == "cpu"
                and getattr(jax.config, "jax_compilation_cache_dir", None)):
            jax.config.update("jax_compilation_cache_dir", None)
            from gpis_tpu.utils.logging import get_logger

            get_logger("compile_cache").info(
                "persistent compile cache off: live backend is cpu")
    except Exception:
        pass
