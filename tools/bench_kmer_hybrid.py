"""Hybrid kmermatcher prototype: device extraction+selection feeding the
host radix sort/scan.

VERDICT r4 item 6: the full-device kmermatcher loses to the host C++
path at every measured size (sort/gather-bound); the unexplored middle
ground is extracting + hash-selecting k-mers on the TPU (dense,
VPU-friendly) and handing the selected entry table to the fused native
sort+assignGroup+scan (the serial-host-selection walk is most of the
host stage's time).  This tool measures that hybrid:

  host path:    extract_selected_kmers_batched -> pref_from_entries
  hybrid path:  kmer_tpu bucket kernels (windows/rowsort/select/compact
                /flatten) -> pull wa/wb2 -> decode -> pref_from_entries

and validates the hybrid PrefDB is bit-identical to the host stage.
Timings split host-prep / device-compute (block_until_ready) / pull so
the tunnel cost is attributable; the PCIe projection uses 10 GB/s.

Usage: python tools/bench_kmer_hybrid.py [reads] [--json-out FILE]
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from carpedeam_tpu.io import SeqDB
    from carpedeam_tpu.kmer.matcher import (extract_selected_kmers_batched,
                                            kmermatcher, pref_from_entries)
    from carpedeam_tpu.constants import CHAR_TO_CODE
    from carpedeam_tpu.ops import kmer_tpu as KT

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_reads = int(args[0]) if args else 120000
    json_out = None
    if "--json-out" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json-out") + 1]
    path = os.path.join(_HERE, "work", f"synth_{n_reads // 1000}k.fq.gz") \
        if n_reads < 1000000 else os.path.join(_HERE, "work",
                                               "synth_1m.fq.gz")
    db = SeqDB.from_fastx(path)
    k, kps, scale, hash_shift = 20, 200, 0.2, 67
    print(f"backend={jax.default_backend()} reads={len(db)}", flush=True)

    # ---- host reference ------------------------------------------------
    t0 = time.perf_counter()
    ent_h = extract_selected_kmers_batched(db, k, kps, scale, hash_shift)
    t_host_extract = time.perf_counter() - t0
    t0 = time.perf_counter()
    pref_h = pref_from_entries(db, ent_h, False)
    t_host_scan = time.perf_counter() - t0
    print(f"host extract {t_host_extract:.3f}s  scan {t_host_scan:.3f}s  "
          f"entries {len(ent_h['kmer'])}", flush=True)

    # ---- device extraction+selection ----------------------------------
    def device_extract(collect=True):
        """The bucket kernels of kmermatcher_device up to the flat entry
        table; returns (host_prep_s, device handles)."""
        was, wb2s = [], []
        host_prep = 0.0
        with jax.enable_x64(True):
            for bl, ids_np in KT._bucketize(db):
                h0 = time.perf_counter()
                B = len(ids_np)
                Bp = KT.bucket_geom(B, lo=256)
                lens_b = db.lengths[ids_np].astype(np.int64)
                codes = np.full((Bp, bl), 4, dtype=np.int8)
                tot = int(lens_b.sum())
                row = np.repeat(np.arange(B), lens_b)
                cum = np.concatenate([[0], np.cumsum(lens_b)])
                col = np.arange(tot) - np.repeat(cum[:-1], lens_b)
                flat = np.repeat(db.offsets[ids_np], lens_b) + col
                codes[row, col] = CHAR_TO_CODE[db.data[flat]]
                lengths = np.zeros(Bp, dtype=np.int32)
                lengths[:B] = lens_b
                ids_pad = np.zeros(Bp, dtype=np.int32)
                ids_pad[:B] = ids_np
                host_prep += time.perf_counter() - h0
                codes_d = jnp.asarray(codes)
                lengths_d = jnp.asarray(lengths)
                ids_d = jnp.asarray(ids_pad)
                phantom = jnp.arange(Bp) >= B

                id_hash = KT._identity_hash(codes_d, lengths_d, hash_shift)
                wa_i, wb2_i = KT._identity_rows(id_hash, ids_d, lengths_d,
                                                phantom)
                was.append(wa_i)
                wb2s.append(wb2_i)
                if bl < k:
                    continue
                key2, ps = KT._windows_bucket(codes_d, lengths_d, k,
                                              hash_shift)
                key2s, ps_s = KT._rowsort_bucket(key2, ps)
                hits = KT._select_bucket(key2s, lengths_d, k, kps,
                                         float(scale))
                W = key2s.shape[1]
                cap = int(np.float32(kps - 1)
                          + np.float32(scale) * np.float32(bl)) + 1
                if cap < W // 2:
                    key2c, psc, selcnt = KT._compact_bucket(key2s, ps_s,
                                                            hits)
                    key2c = key2c[:, :cap]
                    psc = psc[:, :cap]
                else:
                    key2c = jnp.where(hits, key2s, KT.ALL1)
                    psc = ps_s
                    selcnt = jnp.full(key2s.shape[0], W, KT.I32)
                wa_w, wb2_w = KT._flatten_bucket(key2c, psc, selcnt,
                                                 ids_d, lengths_d, k)
                was.append(wa_w)
                wb2s.append(wb2_w)
            wa = jnp.concatenate([w.ravel() for w in was])
            wb2 = jnp.concatenate([w.ravel() for w in wb2s])
        return host_prep, wa, wb2

    # compile/warm
    hp, wa, wb2 = device_extract()
    jax.block_until_ready((wa, wb2))
    # timed: host-prep+dispatch vs device completion
    t0 = time.perf_counter()
    hp, wa, wb2 = device_extract()
    t_dispatch = time.perf_counter() - t0
    jax.block_until_ready((wa, wb2))
    t_extract_total = time.perf_counter() - t0

    t0 = time.perf_counter()
    wa_np = np.asarray(wa)
    wb2_np = np.asarray(wb2)
    t_pull = time.perf_counter() - t0
    pull_bytes = wa_np.nbytes + wb2_np.nbytes

    # ---- decode to the host entry-table format ------------------------
    t0 = time.perf_counter()
    real = wa_np != KT.ALL1
    wa_r = wa_np[real]
    wb_r = wb2_np[real]
    lmask = np.uint64((1 << KT.B_LEN) - 1)
    imask = np.uint64((1 << KT.B_ID) - 1)
    ent_d = {
        "kmer": wa_r | ((wb_r & np.uint64(1)) << np.uint64(63)),
        "id": ((wb_r >> np.uint64(KT.B_LEN + 1)) & imask).astype(np.int64),
        "pos": ((wb_r >> np.uint64(1)) & lmask).astype(np.int32),
        "seq_len": (lmask - (wb_r >> np.uint64(KT.B_ID + KT.B_LEN + 1))
                    ).astype(np.int32),
    }
    t_decode = time.perf_counter() - t0

    t0 = time.perf_counter()
    pref_d = pref_from_entries(db, ent_d, False)
    t_scan_d = time.perf_counter() - t0

    same = (np.array_equal(pref_h.qkey, pref_d.qkey)
            and np.array_equal(pref_h.tkey, pref_d.tkey)
            and np.array_equal(pref_h.score, pref_d.score)
            and np.array_equal(pref_h.diag, pref_d.diag)
            and np.array_equal(pref_h.starts, pref_d.starts))
    dev_only = t_extract_total - hp      # device compute + transfers inside
    pcie_pull = pull_bytes / 10e9
    host_total = t_host_extract + t_host_scan
    hybrid_tunnel = t_extract_total + t_pull + t_decode + t_scan_d
    hybrid_pcie = hp + dev_only + pcie_pull + t_decode + t_scan_d
    print(f"device extract: host-prep {hp:.3f}s + device {dev_only:.3f}s "
          f"(dispatch {t_dispatch:.3f}s)")
    print(f"pull {pull_bytes/1e6:.1f} MB in {t_pull:.3f}s; decode "
          f"{t_decode:.3f}s; host scan {t_scan_d:.3f}s")
    print(f"hybrid bit-identical: {same}")
    print(f"host total {host_total:.3f}s vs hybrid {hybrid_tunnel:.3f}s "
          f"(tunnel) / ~{hybrid_pcie:.3f}s (PCIe 10GB/s projection)")

    if json_out:
        with open(json_out, "w") as fh:
            json.dump({
                "reads": len(db), "entries": int(len(ent_h["kmer"])),
                "bit_identical": bool(same),
                "host_extract_s": round(t_host_extract, 3),
                "host_scan_s": round(t_host_scan, 3),
                "host_total_s": round(host_total, 3),
                "hybrid_host_prep_s": round(hp, 3),
                "hybrid_device_s": round(dev_only, 3),
                "hybrid_pull_s": round(t_pull, 3),
                "hybrid_pull_mb": round(pull_bytes / 1e6, 1),
                "hybrid_decode_s": round(t_decode, 3),
                "hybrid_scan_s": round(t_scan_d, 3),
                "hybrid_total_tunnel_s": round(hybrid_tunnel, 3),
                "hybrid_total_pcie_projection_s": round(hybrid_pcie, 3),
                "measured_at": time.strftime("%Y-%m-%d"),
            }, fh, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
