"""Fine-grained wall-clock profiling of the 4-stage hot path on the
current backend (TPU by default).  Prints per-substep timings so device
vs host-side time is attributable.

Usage: python tools/profile_stage.py [reads]
"""
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def t(label, fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    dt = time.perf_counter() - t0
    print(f"  {label:40s} {dt:8.3f}s", flush=True)
    return out


def main():
    import jax
    import numpy as np
    from carpedeam_tpu.damage import DamageModel
    from carpedeam_tpu.io import SeqDB
    from carpedeam_tpu.params import Params
    from carpedeam_tpu.pipeline import _pick_stage_impls
    from carpedeam_tpu.ops.rescore_tpu import device_planes
    from carpedeam_tpu.utils import bucket_len

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    path = os.path.join(_HERE, "work", f"synth_{n_reads // 1000}k.fq.gz")
    db = SeqDB.from_fastx(path)
    dm = DamageModel.load("/root/reference/example/dhigh")
    params = Params()
    km_fn, rescore_fn, correction_fn, wants_planes = \
        _pick_stage_impls(params)
    print(f"backend={jax.default_backend()} reads={len(db)} "
          f"residues={int(db.lengths.sum())}")

    from carpedeam_tpu.ops.rescore_tpu import PlanesPrefetch

    for rep in range(int(os.environ.get("CARPEDEAM_PROFILE_REPS", "2"))):
        print(f"--- rep {rep} ---")
        pf = None
        if wants_planes:
            pf = PlanesPrefetch(db, max_len=bucket_len(
                min(512, int(db.lengths.max()))))
        pref = t("kmermatcher", km_fn, db, params.kmer_size_reads,
                 params.kmers_per_sequence,
                 params.kmers_per_sequence_scale,
                 params.include_only_extendable_reads, params.hash_shift)
        print(f"  pairs: {len(pref.qkey)}")
        shared = {}
        if wants_planes:
            def mk():
                planes, lengths = pf.get()
                jax.block_until_ready(list(planes.values()))
                return {"planes": planes, "lengths": lengths}
            shared = t("collect prefetched planes", mk)
        aln = t("rescorediagonal TOTAL", rescore_fn, db, pref,
                params.seq_id_thr, params.eval_thr, params.aln_len_thr,
                **shared)
        print(f"  aln records: {len(aln.qkey)}")
        if shared and getattr(correction_fn, "supports_planes_out",
                              False):
            corr, shared2 = t("correction TOTAL (planes out)",
                              correction_fn, db, aln, dm,
                              params.corr_reads_ry_seq_id,
                              params.seq_id_thr, return_planes=True,
                              **shared)
        else:
            corr = t("correction TOTAL", correction_fn, db, aln, dm,
                     params.corr_reads_ry_seq_id, params.seq_id_thr,
                     **shared)
            shared2 = None
        from carpedeam_tpu.stages.read_assembly import read_assembly
        if shared2 is None:
            shared2 = {}
            if wants_planes:
                def mk2():
                    max_len = bucket_len(min(512, int(corr.lengths.max())))
                    planes, lengths = device_planes(corr, max_len=max_len)
                    jax.block_until_ready(list(planes.values()))
                    return {"planes": planes, "lengths": lengths}
                shared2 = t("pack+upload planes (corr)", mk2)
        t("read_assembly TOTAL", read_assembly, corr, aln, dm,
          params.seq_id_thr, params.ry_seq_id_thr,
          params.likelihood_threshold, params.random_align_penal,
          params.excess_penal, params.max_seq_len, params.ancient_unsafe,
          params.min_cov_safe, **shared2)


if __name__ == "__main__":
    main()
