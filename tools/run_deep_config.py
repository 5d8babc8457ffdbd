"""Deep-metagenome configuration head-to-head (BASELINE.json config 4).

Config 4 is "~50M reads with --unsafe + --min-merge-seq-id 0.97
long-contig mode, 12 iterations".  A full 50M tier is out of reach on
this 2-core/125GB dev VM (the reference's own wall at 5M is ~20 min;
50M would be multi-hour per side, and the current 29GB peak RSS at 5M
extrapolates past the box at 50M) — this tool runs the SAME flag
configuration, including a --split-memory-limit low enough to force the
memory-bounded k-mer split path (kmermatcher.cpp:615-706) on both
sides, at the largest feasible mock-community scale, and byte-compares
the FASTAs:

  * ours:      python -m carpedeam_tpu.cli ancient_assemble ... --unsafe
               --min-merge-seq-id 0.97 --num-iterations 12
               --split-memory-limit <lim>
  * reference: .refbuild/src/carpedeam with identical flags

Records wall, peak RSS (ru_maxrss of the subprocess tree via
/usr/bin/time -v), and the FASTA comparison into a JSON row for
SCALE_r05.json.

Usage: python tools/run_deep_config.py work/synth_2m_mock.fq.gz \
           [--split-memory-limit 1G] [--json-out FILE] [--skip-reference] \
           [--default-config]   # drop the deep flags: plain SCALE row pair
"""
import json
import os
import re
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(ROOT, ".refbuild", "src", "carpedeam")
DAMAGE = "/root/reference/example/dhigh"

FLAGS = ["--ancient-damage", DAMAGE, "--unsafe", "1",
         "--min-merge-seq-id", "0.97", "--num-iterations", "12",
         "--threads", "2"]


_RUSAGE_WRAP = (
    "import resource,subprocess,sys;"
    "r=subprocess.run(sys.argv[1:]).returncode;"
    "print('PEAK_RSS_KB',resource.getrusage("
    "resource.RUSAGE_CHILDREN).ru_maxrss,file=sys.stderr);"
    "sys.exit(r)")


def run_timed(cmd, log_path):
    """Run via an isolated Python parent that reports the child tree's
    peak RSS from getrusage(RUSAGE_CHILDREN) (no /usr/bin/time on this
    box); return (wall_s, peak_rss_gb)."""
    t0 = time.perf_counter()
    with open(log_path, "w") as log:
        subprocess.run([sys.executable, "-c", _RUSAGE_WRAP, *cmd],
                       check=True, stdout=log, stderr=log, cwd=ROOT,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    wall = time.perf_counter() - t0
    rss_kb = 0
    with open(log_path) as fh:
        m = re.search(r"PEAK_RSS_KB (\d+)", fh.read())
        if m:
            rss_kb = int(m.group(1))
    return wall, rss_kb / 1e6


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reads = args[0] if args else "work/synth_2m_mock.fq.gz"
    lim = "1G"
    if "--split-memory-limit" in sys.argv:
        lim = sys.argv[sys.argv.index("--split-memory-limit") + 1]
    json_out = None
    if "--json-out" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json-out") + 1]
    if "--default-config" in sys.argv:
        flags = ["--ancient-damage", DAMAGE, "--threads", "2"]
        cfg = "default pipeline flags"
        sub = "scale_" + os.path.basename(reads).split(".")[0]
    else:
        flags = [*FLAGS, "--split-memory-limit", lim]
        cfg = ("BASELINE.json config 4 flags (--unsafe "
               "--min-merge-seq-id 0.97, 12 iterations) + "
               f"--split-memory-limit {lim}")
        sub = "deep"

    work = os.path.join(ROOT, "work", sub)
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    out = {"config": cfg, "reads_file": os.path.basename(reads)}

    mine = os.path.join(work, "mine.fasta")
    t, rss = run_timed([sys.executable, "-m", "carpedeam_tpu.cli",
                        "ancient_assemble", reads, mine,
                        os.path.join(work, "tmp_mine"), *flags],
                       os.path.join(work, "mine.log"))
    out["mine_wall_s"] = round(t, 1)
    out["mine_peak_rss_gb"] = round(rss, 2)
    print(f"mine: {t:.1f}s  peak RSS {rss:.2f} GB", flush=True)

    if "--skip-reference" not in sys.argv and os.path.exists(REF_BIN):
        ref = os.path.join(work, "ref.fasta")
        t, rss = run_timed([REF_BIN, "ancient_assemble", reads, ref,
                            os.path.join(work, "tmp_ref"), *flags,
                            "--delete-tmp-inc", "0"],
                           os.path.join(work, "ref.log"))
        out["reference_wall_s"] = round(t, 1)
        out["reference_peak_rss_gb"] = round(rss, 2)
        same = subprocess.run(["cmp", "-s", mine, ref]).returncode == 0
        out["vs_reference_fasta"] = ("byte-identical (cmp)" if same
                                     else "DIFFERS")
        print(f"ref:  {t:.1f}s  peak RSS {rss:.2f} GB  "
              f"identical={same}", flush=True)

    out["measured_at"] = time.strftime("%Y-%m-%d")
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
