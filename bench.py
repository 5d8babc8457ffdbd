"""Benchmark: residues/s through the assembler's 4-stage per-iteration
hot path — kmermatcher + rescorediagonal + correction + read extension —
exactly as the production pipeline runs them (pipeline._pick_stage_impls
with use_device="auto": device kmermatcher + Pallas rescoring/correction
+ batched extension scoring on TPU), on a 120k-read / 6.04M-residue
synthetic ancient-DNA workload (tools/make_workload.py, seed 1 — the
same generator/seed as the checked-in scale runs).

Prints ONE JSON line:
  {"metric": "hot_path_4stage_residues_per_s", "value": ...,
   "unit": "residues/s", "vs_baseline": ...}

Baseline: the reference C++ binary's 4-stage iteration-0 chain on the
SAME workload, measured standalone with tools/measure_baseline.py on
this machine and checked in as BASELINE_CPU.json (per-stage seconds,
residues/s, timestamp + machine fingerprint).  Regenerate with
  python tools/measure_baseline.py work/synth_120k.fq.gz \
      --json-out BASELINE_CPU.json
after any environment change instead of editing constants (min of 3
reps per stage; includes each stage's process+IO exactly as the
reference workflow pays it).

Timing notes:
  * each repetition runs the COMPLETE stage functions (host prep, device
    kernels, host output assembly) — the same work a pipeline iteration
    pays, so results materialise on the host by construction.
  * steady-state: executables already compiled (shape-bucketed, so one
    compile serves every assembly iteration; compile time amortises away
    at production scale).  First call pays all compiles (~8 min through
    the tunnelled dev TPU; cached per process).
  * CARPEDEAM_BENCH_READS overrides the workload size (e.g. 1000000);
    vs_baseline is reported whenever a measured reference chain for
    that size is checked in (120k: BASELINE_CPU.json; 1M:
    BASELINE_CPU_1M.json).
"""
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

def _load_cpu_baseline(n_reads: int):
    """The reference binary's measured 4-stage numbers for the matching
    workload size, produced by tools/measure_baseline.py --json-out
    (checked in with timestamp + machine fingerprint; regenerate after
    any environment change instead of editing constants).  120k lives in
    BASELINE_CPU.json, 1M in BASELINE_CPU_1M.json."""
    for name in ("BASELINE_CPU.json", "BASELINE_CPU_1M.json"):
        path = os.path.join(_HERE, name)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            d = json.load(fh)
        if d.get("reads") == n_reads:
            return d
    return None


def _workload(n_reads: int) -> str:
    path = os.path.join(_HERE, "work", f"synth_{n_reads // 1000}k.fq.gz") \
        if n_reads < 1000000 else os.path.join(_HERE, "work",
                                               "synth_1m.fq.gz")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        subprocess.run([sys.executable,
                        os.path.join(_HERE, "tools", "make_workload.py"),
                        path, "--reads", str(n_reads), "--seed", "1"],
                       check=True)
    return path


def main():
    import jax
    # NOTE: do NOT enable jax_compilation_cache_dir here — cache
    # serialization hangs compilation on tunnelled TPU backends.
    from carpedeam_tpu.damage import DamageModel
    from carpedeam_tpu.io import SeqDB
    from carpedeam_tpu.params import Params
    from carpedeam_tpu.pipeline import _pick_stage_impls
    from carpedeam_tpu.stages.read_assembly import read_assembly
    from carpedeam_tpu.utils import bucket_len

    n_reads = int(os.environ.get("CARPEDEAM_BENCH_READS", "120000"))
    db = SeqDB.from_fastx(_workload(n_reads))
    dm = DamageModel.load("/root/reference/example/dhigh")
    total_len = int(db.lengths.sum())
    params = Params()

    km_fn, rescore_fn, correction_fn, wants_planes = \
        _pick_stage_impls(params)

    from carpedeam_tpu.ops.rescore_tpu import PlanesPrefetch

    def planes_prefetch(d):
        if not wants_planes:
            return None
        max_len = bucket_len(min(512, int(d.lengths.max())))
        return PlanesPrefetch(d, max_len=max_len)

    def planes_for(d, pf=None):
        if not wants_planes:
            return {}
        if pf is None:
            pf = planes_prefetch(d)
        planes, lengths = pf.get()
        return {"planes": planes, "lengths": lengths}

    def step(report=None):
        t0 = time.perf_counter()
        # plane upload prefetch overlaps the host k-mer scan, exactly as
        # pipeline.nuclassemble dispatches it before the kmermatcher
        pf = planes_prefetch(db)
        pref = km_fn(db, params.kmer_size_reads,
                     params.kmers_per_sequence,
                     params.kmers_per_sequence_scale,
                     params.include_only_extendable_reads,
                     params.hash_shift)
        t1 = time.perf_counter()
        shared = planes_for(db, pf)
        aln = rescore_fn(db, pref, params.seq_id_thr, params.eval_thr,
                         params.aln_len_thr, **shared)
        t2 = time.perf_counter()
        corr_shared = None
        ext_pro = None
        if shared and getattr(correction_fn, "supports_planes_out",
                              False):
            corr_fin, corr_shared = correction_fn(
                db, aln, dm, params.corr_reads_ry_seq_id,
                params.seq_id_thr, return_planes=True, defer=True,
                **shared)
            if corr_shared is not None:
                from carpedeam_tpu.ops.extension_batch import ext_prologue
                ext_pro = ext_prologue(db, aln, corr_shared["planes"],
                                       corr_shared["lengths"])
            corr = corr_fin()
        else:
            corr = correction_fn(db, aln, dm,
                                 params.corr_reads_ry_seq_id,
                                 params.seq_id_thr, **shared)
        t3 = time.perf_counter()
        read_assembly(corr, aln, dm, params.seq_id_thr,
                      params.ry_seq_id_thr, params.likelihood_threshold,
                      params.random_align_penal, params.excess_penal,
                      params.max_seq_len, params.ancient_unsafe,
                      params.min_cov_safe, prologue=ext_pro,
                      **(corr_shared if corr_shared is not None
                         else planes_for(corr)))
        t4 = time.perf_counter()
        if report is not None:
            report.append({"kmermatcher": t1 - t0,
                           "rescorediagonal": t2 - t1,
                           "correction": t3 - t2,
                           "read_assemble": t4 - t3,
                           "total": t4 - t0})

    step()                              # compile + drain queue
    reps = []
    for _ in range(3):
        step(reps)
    best = min(reps, key=lambda r: r["total"])
    for k, v in best.items():
        print(f"# {k}: {v:.3f}s", file=sys.stderr)
    from carpedeam_tpu.utils import coverage_summary
    cov = coverage_summary()
    for stage, d in cov.items():
        print(f"# device-coverage {stage}: {d['device_pct']}% "
              f"({d['device']}/{d['total']} records)", file=sys.stderr)
    cov_out = os.environ.get("CARPEDEAM_COVERAGE_JSON")
    if cov_out:
        with open(cov_out, "w") as fh:
            json.dump({"reads": n_reads, "coverage": cov,
                       "measured_at": time.strftime("%Y-%m-%d")},
                      fh, indent=1)
    value = total_len / best["total"]
    out = {
        "metric": "hot_path_4stage_residues_per_s",
        "value": round(value),
        "unit": "residues/s",
    }
    baseline = _load_cpu_baseline(n_reads)
    if baseline is not None:
        out["vs_baseline"] = round(value / baseline["residues_per_s"],
                                   3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
