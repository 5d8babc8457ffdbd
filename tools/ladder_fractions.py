"""Length-ladder device-routable fractions from a completed run's
checkpoint DBs.

The full-pipeline device-coverage counters (tools/measure_coverage.py)
need the device stage impls in the loop; at 1M+ that is wall-clock
expensive on this dev setup.  The dominant routing predicate, however,
is pure record length — rescore takes pairs with max(qlen,tlen) <=
16384 on device (rescore_pallas.py LEN_LEVELS), correction takes
queries <= 8192 (CORR_LEN_LEVELS max) — so the fraction of records a
device run WOULD route to the host oracles is computable exactly from
the per-iteration sequence DBs a host run leaves behind.  (The two
secondary host-routing terms — non-ACGT queries and stack depth beyond
the record tile — are not length-derivable; the numbers here are
therefore an upper bound on device coverage, stated as such.)

Usage: python tools/ladder_fractions.py RUN_TMP_DIR [--json-out F]
       (RUN_TMP_DIR = the ancient_assemble tmp dir of a finished run)
"""
import glob
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

RESCORE_MAX = 16384     # rescore_pallas.LEN_LEVELS[-1]
CORR_MAX = 8192         # correction_pallas CORR_LEN_LEVELS max


def main():
    import numpy as np
    from carpedeam_tpu.io import SeqDB

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tmp = args[0]
    json_out = None
    if "--json-out" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json-out") + 1]

    rows = []
    # checkpoint layout: <tmp>/nuclassembly_tmp/<paramhash>/
    #   assembly_reads_N.npz / assembly_contigs_N.npz per iteration
    pats = sorted(glob.glob(os.path.join(
        tmp, "**", "assembly_*_[0-9]*.npz", ), recursive=True))
    for p in pats:
        base = os.path.basename(p)[:-4]
        try:
            db = SeqDB.load(p[:-4])
        except Exception:
            continue
        lens = np.asarray(db.lengths)
        n = len(lens)
        if n == 0:
            continue
        rows.append({
            "db": base, "records": int(n),
            "max_len": int(lens.max()),
            "rescore_device_frac": round(
                float((lens <= RESCORE_MAX).mean()), 6),
            "correction_device_frac": round(
                float((lens <= CORR_MAX).mean()), 6),
        })
        print(rows[-1], flush=True)

    out = {"tmp_dir": tmp,
           "note": "upper bound on device coverage: length predicate "
                   "only (non-ACGT + stack-depth host routing excluded); "
                   "rescore ladder max 16384, correction 8192",
           "per_db": rows}
    if rows:
        out["min_rescore_device_frac"] = min(r["rescore_device_frac"]
                                             for r in rows)
        out["min_correction_device_frac"] = min(
            r["correction_device_frac"] for r in rows)
    print(json.dumps({k: v for k, v in out.items() if k != "per_db"}))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
