"""Measure the reference binary's 4-stage hot-path throughput.

The BASELINE.md target is >=10x residues/s per host over the reference's
CPU hot path.  The hot path per assembly iteration is the 4-stage chain
kmermatcher -> rescorediagonal -> ancient_correction ->
ancient_read_assemble (lib/mmseqs/src/linclust/kmermatcher.cpp:78-563,
alignment/rescorediagonal.cpp:146-354, src/assembler/correction.cpp:
200-463, ancientReadsResults.cpp:179-366).  This script:

  1. runs the reference `ancient_assemble` once on the given workload
     with all tmp files kept, so every iteration-0 intermediate DB
     exists;
  2. re-runs each of the four iteration-0 stage commands (the exact
     command lines the workflow logged) N times standalone and takes the
     minimum wall clock;
  3. prints the per-stage seconds, the 4-stage total, and residues/s.

The resulting number is recorded in bench.py as the CPU baseline (with
machine provenance); re-run this script to reproduce it.

Usage: python tools/measure_baseline.py WORKLOAD.fq.gz [--reps 3]
       [--binary .refbuild/src/carpedeam]
"""
from __future__ import annotations

import argparse
import gzip
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--binary", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".refbuild", "src", "carpedeam"))
    ap.add_argument("--damage", default="/root/reference/example/dhigh")
    ap.add_argument("--json-out", default=None,
                    help="write the result (with timestamp + machine "
                         "fingerprint) to this JSON file; bench.py reads "
                         "BASELINE_CPU.json at the repo root")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="refbaseline_")
    out_fa = os.path.join(tmp, "out.fasta")
    tmpdir = os.path.join(tmp, "reftmp")
    t0 = time.perf_counter()
    log = subprocess.run(
        [args.binary, "ancient_assemble", args.workload, out_fa, tmpdir,
         "--ancient-damage", args.damage, "--delete-tmp-inc", "0",
         "--remove-tmp-files", "0"],
        capture_output=True, text=True, check=True)
    full_wall = time.perf_counter() - t0
    text = log.stdout + log.stderr

    # iteration-0 stage command lines, exactly as the workflow ran them
    cmds = {}
    for name, pat in [
            ("kmermatcher", r"^kmermatcher \S+ \S+/pref_0 .*$"),
            ("rescorediagonal", r"^rescorediagonal .* \S+/aln_0 .*$"),
            ("correction", r"^ancient_correction .* \S+/correction_0 .*$"),
            ("read_assemble",
             r"^ancient_read_assemble .* \S+/assembly_reads_0 .*$")]:
        m = re.search(pat, text, re.M)
        if not m:
            sys.exit(f"stage command not found in log: {name}")
        cmds[name] = m.group(0).split()

    # residues in the workload
    residues = 0
    op = gzip.open if args.workload.endswith(".gz") else open
    with op(args.workload, "rt") as fh:
        for i, line in enumerate(fh):
            if i % 4 == 1:
                residues += len(line.strip())

    times = {}
    for name, cmd in cmds.items():
        best = None
        for _ in range(args.reps):
            # rerun writes the same outputs; remove .done + outputs so
            # the stage actually recomputes
            t0 = time.perf_counter()
            subprocess.run([args.binary] + cmd, capture_output=True,
                           check=True)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = best

    total = sum(times.values())
    print(f"workload: {args.workload}  residues={residues}")
    print(f"full ancient_assemble wall: {full_wall:.2f}s")
    for name, dt in times.items():
        print(f"  {name}: {dt:.3f}s")
    print(f"4-stage total: {total:.3f}s -> "
          f"{residues / total:,.0f} residues/s")
    if args.json_out:
        import json
        import platform
        with op(args.workload, "rt") as fh:
            n_reads = sum(1 for i, _ in enumerate(fh) if i % 4 == 0)
        cpu = ""
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("model name"):
                        cpu = line.split(":", 1)[1].strip()
                        break
        except OSError:
            pass
        payload = {
            "workload": os.path.basename(args.workload),
            "reads": n_reads,
            "residues": residues,
            "stage_s": {k: round(v, 4) for k, v in times.items()},
            "total_s": round(total, 4),
            "residues_per_s": round(residues / total, 1),
            "full_wall_s": round(full_wall, 2),
            "reps": args.reps,
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "machine": {"cpu": cpu, "cores": os.cpu_count(),
                        "platform": platform.platform()},
            "binary": args.binary,
        }
        with open(args.json_out, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
        print(f"wrote {args.json_out}")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
