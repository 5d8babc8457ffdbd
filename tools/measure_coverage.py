"""Per-stage device-coverage percentages for a FULL pipeline run.

VERDICT r4 item 7: the device length ladders stop at 8k (correction) /
16k (rescore) vs --max-seq-len 200-300k, and records beyond them route
to the exact host oracles; the telemetry existed but no artifact ever
recorded the percentage at scale.  This tool runs the complete
ancient_assemble pipeline with the DEVICE stage implementations forced
on (--use-device 1) and aggregates the DEVICE_COVERAGE counters over
every iteration — read phase AND contig phase, where the long records
live.

The routing predicates (rescore_pallas.py:336-338 length levels,
correction_pallas.py:620-625 heavy-stack set, extension_batch.py:256-258
non-ACGT flags) depend only on record shapes/content, never on the JAX
backend, so running under JAX_PLATFORMS=cpu measures the exact
percentages a TPU run would see without paying the dev-tunnel transfer
tax.  (test_device_parity.py pins that the device impls are bit-exact
vs the host oracles on both backends.)

Usage: python tools/measure_coverage.py WORKLOAD.fq.gz [--json-out F]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNIPPET = r"""
import atexit, json, os, sys
sys.path.insert(0, {root!r})
def _report():
    from carpedeam_tpu.utils import coverage_summary
    with open(os.environ["CARPEDEAM_COVERAGE_JSON"], "w") as fh:
        json.dump(coverage_summary(), fh, indent=1)
atexit.register(_report)
import runpy
runpy.run_module("carpedeam_tpu.cli", run_name="__main__")
"""


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reads = args[0] if args else "work/synth_1m.fq.gz"
    json_out = None
    if "--json-out" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json-out") + 1]

    with tempfile.TemporaryDirectory() as tmp:
        runner = os.path.join(tmp, "runner.py")
        with open(runner, "w") as fh:
            fh.write(_SNIPPET.format(root=ROOT))
        cov_path = os.path.join(tmp, "cov.json")
        t0 = time.perf_counter()
        subprocess.run(
            [sys.executable, runner, "ancient_assemble", reads,
             os.path.join(tmp, "out.fasta"), os.path.join(tmp, "tmp"),
             "--ancient-damage", "/root/reference/example/dhigh",
             "--use-device", "1"],
            check=True, cwd=ROOT,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "CARPEDEAM_COVERAGE_JSON": cov_path})
        wall = time.perf_counter() - t0
        with open(cov_path) as fh:
            cov = json.load(fh)

    out = {"reads_file": os.path.basename(reads),
           "note": "full ancient_assemble, device stage impls forced on "
                   "(--use-device 1, JAX cpu backend — routing predicates "
                   "are backend-independent), counters aggregated over "
                   "ALL iterations incl. contig phase",
           "wall_s": round(wall, 1),
           "coverage": cov,
           "measured_at": time.strftime("%Y-%m-%d")}
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
