"""Multi-rank scaling efficiency of the distributed pipeline mode.

BASELINE.md target: >=80% scaling efficiency at 2 hosts.  This emulates
"one host = one core" on a small box: each rank is one process pinned
to one OpenMP thread (CARPEDEAM_RANK/WORLD, shared-filesystem barriers —
the reference's --mpi-runner contract).  Efficiency(w) =
T_1rank / (w * T_wrank); ranks share memory bandwidth and disk on one
box, so this is a LOWER bound on true multi-host efficiency, and any
world above the physical core count adds pure oversubscription on top.

Also records the spill-exchange volume per rank (SPILL_BYTES counters
in parallel/distributed.py) so the bytes-per-iteration cost of the
distribution is a measured number, not an estimate.

Usage: python tools/measure_scaling.py [workload.fq.gz] [worlds...]
       (default worlds: 1 2 4)
Prints one JSON line per world plus a summary line.
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SPILL_SNIPPET = r"""
import atexit, json, os, sys
sys.path.insert(0, {root!r})
def _report_spill():
    try:
        from carpedeam_tpu.parallel.distributed import SPILL_BYTES
        path = os.environ.get("CARPEDEAM_SPILL_REPORT")
        if path:
            with open(path + "." + os.environ.get("CARPEDEAM_RANK", "0"),
                      "w") as fh:
                json.dump(SPILL_BYTES, fh)
    except Exception:
        pass
atexit.register(_report_spill)
import runpy
runpy.run_module("carpedeam_tpu.cli", run_name="__main__")
"""


def run(reads, world, tmp, threads_per_rank):
    out = os.path.join(tmp, f"out_w{world}.fasta")
    spill_report = os.path.join(tmp, f"spill_w{world}")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "OMP_NUM_THREADS": str(threads_per_rank),
           "CARPEDEAM_SPILL_REPORT": spill_report}
    runner = os.path.join(tmp, "runner.py")
    with open(runner, "w") as fh:
        fh.write(_SPILL_SNIPPET.format(root=ROOT))
    procs = []
    t0 = time.perf_counter()
    for rank in range(world):
        e = dict(env)
        if world > 1:
            e["CARPEDEAM_WORLD"] = str(world)
            e["CARPEDEAM_RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, runner, "ancient_assemble",
             reads, out, os.path.join(tmp, f"tmp_w{world}"),
             "--ancient-damage", "/root/reference/example/dhigh"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env=e, cwd=ROOT))
    for p in procs:
        p.wait(timeout=3600)
        assert p.returncode == 0, p.returncode
    wall = time.perf_counter() - t0
    spill = {"write": 0, "read": 0}
    for rank in range(world):
        try:
            with open(f"{spill_report}.{rank}") as fh:
                d = json.load(fh)
            spill["write"] += d.get("write", 0)
            spill["read"] += d.get("read", 0)
        except OSError:
            pass
    return wall, out, spill


def main():
    args = sys.argv[1:]
    reads = args[0] if args and not args[0].isdigit() \
        else os.path.join(ROOT, "work", "synth_120k.fq.gz")
    worlds = [int(a) for a in args if a.isdigit()] or [1, 2, 4]
    ncores = os.cpu_count() or 1
    tmp = tempfile.mkdtemp(prefix="scaling_")
    rows = []
    try:
        base = None
        ref_out = None
        for w in sorted(set([1] + worlds)):
            t, out, spill = run(reads, w, tmp, 1)
            if w == 1:
                base, ref_out = t, out
                if 1 not in worlds:
                    continue
            row = {
                "workload": os.path.basename(reads),
                "world": w,
                "wall_s": round(t, 1),
                "scaling_efficiency": round(base / (w * t), 3)
                if w > 1 else 1.0,
                "output_byte_identical":
                    open(out, "rb").read() == open(ref_out, "rb").read(),
                "spill_gb": {k: round(v / 1e9, 3)
                             for k, v in spill.items()},
                "oversubscribed": w > ncores,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({"summary": rows, "cores": ncores,
                          "note": "single-box emulation (1 thread/rank): "
                                  "shared memory bus + disk, lower bound "
                                  "on real multi-host efficiency; worlds "
                                  "beyond core count are oversubscribed"}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
