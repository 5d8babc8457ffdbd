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
            self._log(f"{name}: {secs:.3f}s")

    def summary(self) -> dict:
        out: dict[str, float] = {}
        for name, secs in self.records:
            out[name] = out.get(name, 0.0) + secs
        return out


class _StageScope:
    def __init__(self, timer: StageTimer, name: str):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.timer.add(self.name, time.perf_counter() - self.t0)
        return False
