"""Shared runtime utilities: shape bucketing, stage timing, logging.

XLA compiles one executable per input-shape signature; the assembly loop's
natural shapes (pair count, total residue count, max sequence length) drift
every iteration, which would force a recompile per stage per iteration.
All device-stage wrappers round their dynamic dimensions up to bucket
boundaries so executables are reused across iterations (padding records are
masked out inside the kernels / sliced off on the host).
"""
from __future__ import annotations

import os
import time


def bucket(n: int, q: int) -> int:
    """Round n up to a multiple of q (minimum q)."""
    return max(q, ((int(n) + q - 1) // q) * q)


PAIR_BUCKET = int(os.environ.get("CARPEDEAM_PAIR_BUCKET", 16384))
POS_BUCKET = int(os.environ.get("CARPEDEAM_POS_BUCKET", 131072))
LEN_BUCKET = int(os.environ.get("CARPEDEAM_LEN_BUCKET", 128))


def bucket_pairs(n: int) -> int:
    return bucket(n, PAIR_BUCKET)


def bucket_positions(n: int) -> int:
    return bucket(n, POS_BUCKET)


def bucket_len(n: int) -> int:
    return bucket(n, LEN_BUCKET)


def device_is_tpu() -> bool:
    """True when the default JAX backend is a real TPU: the Pallas kernels
    use pltpu memory spaces (interpret mode only on CPU) and would crash
    at launch on other accelerators."""
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def device_is_accelerator() -> bool:
    """True when the default JAX backend is any accelerator worth paying
    dispatch overhead for (the XLA kernel paths run on all backends)."""
    import jax
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class StageTimer:
    """Wall-clock per-stage timing (the reference's Timer/Debug::Progress
    analogue, lib/mmseqs/src/commons/Timer.h).  Collects (stage, seconds)
    and prints through the supplied logger when verbose."""

    def __init__(self, log=None):
        self.records: list[tuple[str, float]] = []
        self._log = log

    def time(self, name: str):
        return _StageScope(self, name)

    def add(self, name: str, secs: float) -> None:
        self.records.append((name, secs))
        if self._log:
            self._log(f"{name}: {secs:.3f}s{_rss_suffix()}")

    def summary(self) -> dict:
        out: dict[str, float] = {}
        for name, secs in self.records:
            out[name] = out.get(name, 0.0) + secs
        return out


def _rss_suffix() -> str:
    """' [rss now/peak GB]' for stage logs — the footprint attribution
    the reference gets from its 1-byte-per-residue design doc
    (README.md:89-91); /proc is Linux-only, degrade to empty."""
    try:
        with open("/proc/self/status") as fh:
            txt = fh.read()
        now = int(txt.split("VmRSS:")[1].split()[0]) / 1e6
        peak = int(txt.split("VmHWM:")[1].split()[0]) / 1e6
        return f"  [rss {now:.1f}/{peak:.1f} GB]"
    except Exception:
        return ""


class _StageScope:
    def __init__(self, timer: StageTimer, name: str):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.timer.add(self.name, time.perf_counter() - self.t0)
        return False


# --------------------------------------------------------------------------
# Sub-step profiling: fine-grained host-prep / H2D / device / D2H / host-
# assembly attribution inside the device stages.  Enabled with
# CARPEDEAM_SUBTIMING=1; prints "## <stage>.<step>: <secs>" to stderr and
# accumulates into SUBTIMES for programmatic reads (tools/profile_fine.py).
# --------------------------------------------------------------------------
_SUBTIMING = os.environ.get("CARPEDEAM_SUBTIMING", "") not in ("", "0")
SUBTIMES: dict[str, float] = {}


class _SubScope:
    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        SUBTIMES[self.name] = SUBTIMES.get(self.name, 0.0) + dt
        import sys
        print(f"## {self.name}: {dt:.4f}s", file=sys.stderr, flush=True)
        return False


class _NullScope:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


_NULL_SCOPE = _NullScope()


def subtimer(name: str):
    """Context manager timing one sub-step when CARPEDEAM_SUBTIMING=1
    (no-op otherwise; the hot path pays one truthiness check)."""
    return _SubScope(name) if _SUBTIMING else _NULL_SCOPE


# --------------------------------------------------------------------------
# Device-coverage accounting: per stage, how many records ran on the
# device kernels vs through the exact host oracles (length-ladder
# overflows, non-ACGT chars, deep stacks).  Aggregated per run so the
# SCALE/PERF artifacts can report "N% of records on device" as a
# measured number per stage rather than a log line.
# --------------------------------------------------------------------------
DEVICE_COVERAGE: dict[str, dict[str, int]] = {}


def coverage_add(stage: str, device_n: int, host_n: int) -> None:
    d = DEVICE_COVERAGE.setdefault(stage, {"device": 0, "host": 0})
    d["device"] += int(device_n)
    d["host"] += int(host_n)


def coverage_summary() -> dict[str, dict]:
    out = {}
    for stage, d in DEVICE_COVERAGE.items():
        total = d["device"] + d["host"]
        out[stage] = {**d, "total": total,
                      "device_pct": round(100.0 * d["device"] / total, 2)
                      if total else None}
    return out


# --------------------------------------------------------------------------
# Verbosity-levelled logging + progress/ETA (the reference's Debug class
# and Debug::Progress bar, lib/mmseqs/src/commons/Debug.h:20-160).
# Levels: 0 NOTHING, 1 ERROR, 2 WARNING, 3 INFO (reference default).
# --------------------------------------------------------------------------
import sys as _sys

NOTHING, ERROR_LVL, WARNING_LVL, INFO_LVL = 0, 1, 2, 3
_VERBOSITY = INFO_LVL


def set_verbosity(level: int) -> None:
    global _VERBOSITY
    _VERBOSITY = int(level)


def get_verbosity() -> int:
    return _VERBOSITY


def log_error(msg: str) -> None:
    if _VERBOSITY >= ERROR_LVL:
        print(f"Error: {msg}", file=_sys.stderr, flush=True)


def log_warning(msg: str) -> None:
    if _VERBOSITY >= WARNING_LVL:
        print(f"Warning: {msg}", file=_sys.stderr, flush=True)


def log_info(msg: str) -> None:
    if _VERBOSITY >= INFO_LVL:
        print(msg, flush=True)


class Progress:
    """Debug::Progress analogue with elapsed/ETA: throttled single-line
    updates on a tty, plain milestone lines otherwise.  Silent below
    INFO verbosity."""

    def __init__(self, total: int, label: str = "", min_interval=0.5):
        self.total = max(int(total), 1)
        self.label = label
        self.min_interval = min_interval
        self.t0 = time.perf_counter()
        self.cur = 0
        self._last_print = 0.0
        self._tty = _sys.stderr.isatty()

    def update(self, n: int = 1) -> None:
        self.cur += n
        now = time.perf_counter()
        if _VERBOSITY < INFO_LVL:
            return
        if now - self._last_print < self.min_interval \
                and self.cur < self.total:
            return
        self._last_print = now
        elapsed = now - self.t0
        frac = min(self.cur / self.total, 1.0)
        eta = elapsed * (1.0 - frac) / frac if frac > 0 else 0.0
        line = (f"{self.label} {self.cur}/{self.total} "
                f"({100.0 * frac:.0f}%)  elapsed {elapsed:.1f}s  "
                f"ETA {eta:.1f}s")
        if self._tty:
            print(f"\r{line}\x1b[K", file=_sys.stderr, end="", flush=True)
        else:
            print(line, file=_sys.stderr, flush=True)

    def done(self) -> None:
        if _VERBOSITY >= INFO_LVL and self._tty:
            print(file=_sys.stderr, flush=True)
