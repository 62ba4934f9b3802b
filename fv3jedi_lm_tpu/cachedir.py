"""Persistent-compilation-cache hygiene.

The workspace's .jax_cache survives across build rounds, which can run on
DIFFERENT machines: XLA:CPU AOT executables record the compile machine's
feature set, and loading one on a host without those features warns
"could lead to execution errors such as SIGILL" — observed in round 5 as
deterministic SIGSEGV/SIGABRT mid-test-suite.  `ensure_compatible` stamps
the cache directory with a CPU-feature fingerprint and purges all entries
when the fingerprint changes.
"""

from __future__ import annotations

import hashlib
import os


def _machine_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def ensure_compatible(cache_path: str) -> str:
    """Purge `cache_path` if it was populated on a different machine;
    returns the path (created if needed)."""
    os.makedirs(cache_path, exist_ok=True)
    marker = os.path.join(cache_path, "MACHINE_TAG")
    tag = _machine_tag()
    old = None
    if os.path.exists(marker):
        with open(marker) as f:
            old = f.read().strip()
    if old != tag:
        if old is not None:
            n = 0
            for name in os.listdir(cache_path):
                if name == "MACHINE_TAG":
                    continue
                try:
                    os.remove(os.path.join(cache_path, name))
                    n += 1
                except OSError:
                    pass
            print(f"# fv3lm: purged {n} cross-machine compilation-cache "
                  f"entries ({old} -> {tag})")
        with open(marker, "w") as f:
            f.write(tag)
    return cache_path
