"""General helpers (reference `/root/reference/utils/general.py`)."""
from __future__ import annotations

import sys

import numpy as np


def as_numpy(a):
    """Device arrays / lists of arrays -> host numpy (utils/general.py:6-17).
    In JAX this is np.asarray, which blocks on and fetches device buffers."""
    if isinstance(a, (list, tuple)):
        out = [np.asarray(x) for x in a]
        try:
            return np.concatenate(out, axis=0)
        except ValueError:
            return out
    return np.asarray(a)


def print_progress(iteration, total, prefix="", suffix="", decimals=1, bar_length=100):
    """Terminal progress bar (utils/general.py:20-40)."""
    str_format = "{0:." + str(decimals) + "f}"
    percents = str_format.format(100 * (iteration / float(total)))
    filled_length = int(round(bar_length * iteration / float(total)))
    bar = "#" * filled_length + "-" * (bar_length - filled_length)
    sys.stdout.write("\r%s |%s| %s%s %s" % (prefix, bar, percents, "%", suffix))
    if iteration == total:
        sys.stdout.write("\n")
    sys.stdout.flush()


def cpu_cache_dir(base: str = "/tmp/videoyolo_tpu_jax_cache_cpu") -> str:
    """Persistent-compile-cache dir for CPU-backend runs, keyed by the host
    CPU-flag fingerprint.  This box is a microVM whose vCPU features can
    change across boots; XLA:CPU AOT entries written under a different
    fingerprint load with a full-page E-log each and a documented SIGILL
    risk, so each fingerprint gets its own dir.  (The TPU cache has no such
    issue — its executables target the chip, not the host.)"""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        import platform

        flags = platform.machine()
    return f"{base}_{hashlib.sha1(flags.encode()).hexdigest()[:8]}"
