"""2-host scaling efficiency of the distributed pipeline mode.

BASELINE.md target: >=80% scaling efficiency at 2 hosts.  This emulates
"one host = one core" on a 2-core box: (a) one process pinned to one
OpenMP thread, (b) two ranks (CARPEDEAM_RANK/WORLD, shared-filesystem
barriers — the reference's --mpi-runner contract) with one thread
each.  Efficiency = T_1rank / (2 * T_2rank); the ranks share memory
bandwidth and disk on one box, so this is a LOWER bound on true
2-host efficiency.

Usage: python tools/measure_scaling.py [workload.fq.gz]
Prints one JSON line.
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(reads, world, tmp, threads_per_rank):
    out = os.path.join(tmp, f"out_w{world}.fasta")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "OMP_NUM_THREADS": str(threads_per_rank)}
    procs = []
    t0 = time.perf_counter()
    for rank in range(world):
        e = dict(env)
        if world > 1:
            e["CARPEDEAM_WORLD"] = str(world)
            e["CARPEDEAM_RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "carpedeam_tpu.cli", "ancient_assemble",
             reads, out, os.path.join(tmp, f"tmp_w{world}"),
             "--ancient-damage", "/root/reference/example/dhigh"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env=e, cwd=ROOT))
    for p in procs:
        p.wait(timeout=2400)
        assert p.returncode == 0, p.returncode
    return time.perf_counter() - t0, out


def main():
    reads = sys.argv[1] if len(sys.argv) > 1 \
        else os.path.join(ROOT, "work", "synth_120k.fq.gz")
    tmp = tempfile.mkdtemp(prefix="scaling_")
    try:
        t1, out1 = run(reads, 1, tmp, 1)
        t2, out2 = run(reads, 2, tmp, 1)
        identical = open(out1, "rb").read() == open(out2, "rb").read()
        eff = t1 / (2 * t2)
        print(json.dumps({
            "workload": os.path.basename(reads),
            "t_1rank_1thread_s": round(t1, 1),
            "t_2rank_1thread_s": round(t2, 1),
            "scaling_efficiency": round(eff, 3),
            "output_byte_identical": identical,
            "note": "single-box measurement: ranks share memory "
                    "bandwidth, lower bound on 2-host efficiency",
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
