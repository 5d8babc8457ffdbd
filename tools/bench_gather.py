"""Microbenchmark backing the device-kmermatcher concession.

README states the device kmermatcher loses to the host C++ path because
k-mer overlap discovery is sort/gather-bound and XLA:TPU 1D random
gathers sustain only ~60M elem/s.  That number previously lived in
prose; this tool measures it and emits a JSON artifact so the concession
is auditable:

  * random 1D gather throughput (u32 indices into a u64 table) at
    several table/index sizes — the access pattern of k-mer group
    reconstruction;
  * u64 sort throughput via jax.lax.sort (the two-operand key/value
    sort the device kmermatcher is built on);
  * the same sort on the host path (native adaptive LSD radix via
    kmer_pairs.cpp) for the head-to-head;
  * sequential-read bandwidth (device memcpy-like slice+add) as the
    roofline reference point.

Usage: python tools/bench_gather.py [--json-out GATHER_BENCH.json]
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def timeit(fn, reps=5):
    fn()                          # compile/warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    json_out = None
    if "--json-out" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json-out") + 1]

    backend = jax.default_backend()
    rng = np.random.default_rng(1)
    out = {"backend": backend, "measured_at": time.strftime("%Y-%m-%d"),
           "gather": [], "sort": [], "seq_read": []}

    # K data-dependent iterations inside ONE jitted program, timed with a
    # scalar pull at the end: robust against tunnel dispatch asynchrony
    # (block_until_ready through the IFRT proxy returns before execution
    # completes — raw per-call timings here measured 0.06 ms for 268 MB
    # gathers, which is physically impossible).  Per-iteration time =
    # (t_K2 - t_K1) / (K2 - K1), cancelling the constant pull latency.
    K1, K2 = 2, 10

    def chain_time(make_body, *args):
        def run(k):
            f = jax.jit(lambda *a: jax.lax.fori_loop(
                0, k, make_body(*a), jnp.uint64(0)))
            float(np.asarray(f(*args)))          # compile + pull
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(f(*args)))
                best = min(best, time.perf_counter() - t0)
            return best
        # Adaptive spread: a fast kernel's K2-K1 delta can sit below the
        # ~23 ms constant pull-latency noise and come out negative; widen
        # the iteration count until the delta clearly exceeds the noise.
        k2 = K2
        while k2 <= 5120:
            delta = run(k2) - run(K1)
            if delta > 0.015 * (1 if k2 == K2 else 2):
                return delta / (k2 - K1)
            k2 *= 4
        return max(delta, 0.0) / (k2 // 4 - K1)

    for n in (1 << 20, 1 << 23, 1 << 25):
        table = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
        idx = jnp.asarray(rng.integers(0, n, n, dtype=np.uint32))

        def gather_body(t_, i_):
            def body(_, acc):
                # accumulate so every iteration depends on the last
                return acc + t_[(i_ ^ acc.astype(jnp.uint32)
                                 % jnp.uint32(2))].max()
            return body
        t = chain_time(gather_body, table, idx)
        out["gather"].append({"n": n, "s": round(t, 5),
                              "elem_per_s": round(n / t)})
        print(f"gather   n={n:>9}  {t*1e3:8.2f} ms  "
              f"{n/t/1e6:8.1f} M elem/s", flush=True)

        keys = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))

        def sort_body(k_):
            def body(_, acc):
                s = jax.lax.sort(k_ ^ acc, is_stable=False)
                return s[0] + s[-1]
            return body
        t = chain_time(sort_body, keys)
        out["sort"].append({"n": n, "s": round(t, 5),
                            "elem_per_s": round(n / t),
                            "impl": "jax.lax.sort u64"})
        print(f"dev sort n={n:>9}  {t*1e3:8.2f} ms  "
              f"{n/t/1e6:8.1f} M elem/s", flush=True)

        def read_body(t_):
            def body(_, acc):
                return acc + (t_ ^ acc).max()
            return body
        ts = chain_time(read_body, table)
        out["seq_read"].append({"n": n, "s": round(ts, 6),
                                "gb_per_s": round(n * 8 / ts / 1e9, 1)})
        print(f"seq read n={n:>9}  {ts*1e3:8.2f} ms  "
              f"{n*8/ts/1e9:8.1f} GB/s", flush=True)

    # host radix sort head-to-head (the fused native scan's sort;
    # np.argsort as the numpy reference point)
    from carpedeam_tpu import native
    for n in (1 << 23, 1 << 25):
        keys = rng.integers(0, 1 << 62, n, dtype=np.uint64)
        t_np = timeit(lambda: np.sort(keys), reps=3)
        row = {"n": n, "numpy_sort_s": round(t_np, 4),
               "numpy_elem_per_s": round(n / t_np)}
        print(f"host np.sort n={n:>9}  {t_np*1e3:8.1f} ms  "
              f"{n/t_np/1e6:8.1f} M elem/s", flush=True)
        out["sort"].append(row)

    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
