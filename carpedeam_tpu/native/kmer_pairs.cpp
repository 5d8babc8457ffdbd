// kmermatcher post-extraction pipeline in one native pass:
//   global entry sort -> group/centre assignment -> pair sort ->
//   per-(centre,member) best-diagonal scan -> prefilter rows.
//
// This is the host-side equivalent of the reference's sort+assignGroup+
// writeKmerMatcherResult chain (lib/mmseqs/src/linclust/kmermatcher.cpp:
// 409-563, 815-930), fused so no intermediate table is materialised in
// NumPy (the Python assign_groups path allocates a dozen n-sized int64
// temporaries — at 32M entries that dominates the whole stage).
// Semantics are bit-identical to kmer/matcher.py's assign_groups +
// _build_pref_db_python (oracle-tested there against the C++ reference).
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Entry {
    uint64_t key;    // kmer | bit63
    uint64_t tie;    // (~len)<<40 | id
    uint64_t kmer;   // raw kmer field (strand bit intact)
    int32_t pos;
    int32_t seq_len;
    int64_t id;
    bool operator<(const Entry &o) const {
        if (key != o.key) return key < o.key;
        if (tie != o.tie) return tie < o.tie;
        return pos < o.pos;
    }
};

struct Pair {
    uint64_t k1;     // centre<<32 | member
    uint32_t k2;     // diag ^ 0x80000000 (signed order)
    int64_t centre;
    int64_t member;
    int32_t diag;
    uint8_t fwd;
    bool operator<(const Pair &o) const {
        if (k1 != o.k1) return k1 < o.k1;
        return k2 < o.k2;
    }
};

template <typename T>
void parallel_sort2(std::vector<T> &v) {
#ifdef _OPENMP
    const int64_t n = (int64_t)v.size();
    if (n > (1 << 16)) {
        const int64_t half = n / 2;
#pragma omp parallel sections
        {
#pragma omp section
            std::sort(v.begin(), v.begin() + half);
#pragma omp section
            std::sort(v.begin() + half, v.end());
        }
        std::inplace_merge(v.begin(), v.begin() + half, v.end());
        return;
    }
#endif
    std::sort(v.begin(), v.end());
}

inline bool can_cover(int cov_mode, float cov_thr, float ql, float tl) {
    if (cov_thr <= 0.0f) return true;
    switch (cov_mode) {
        case 0: return (ql / tl >= cov_thr) && (tl / ql >= cov_thr);
        case 1: return ql / tl >= cov_thr;
        case 2: return tl / ql >= cov_thr;
        case 3: return (tl / ql >= cov_thr) && (tl / ql <= 1.0f);
        case 4: return (ql / tl >= cov_thr) && (ql / tl <= 1.0f);
        case 5: {
            const float mn = ql < tl ? ql : tl, mx = ql < tl ? tl : ql;
            return mn / mx >= cov_thr;
        }
        default: return true;
    }
}

}  // namespace

extern "C" {

// declared in host_kernels.cpp
int64_t build_pref_scan(
    const int64_t *c, const uint8_t *f, const int64_t *m, const int32_t *d,
    int64_t n, const uint32_t *keys,
    uint32_t *qkey_o, uint32_t *tkey_o, int32_t *score_o, int32_t *diag_o,
    int64_t *group_row_start, int64_t *group_centre, int64_t *n_groups_o);

// Full post-extraction kmermatcher: returns row count; *n_groups_o like
// build_pref_scan.  Row buffers must hold n + #groups rows (cap 2n + 2).
int64_t kmermatcher_scan(
    const uint64_t *kmer, const int64_t *id, const int32_t *pos,
    const int32_t *seq_len, int64_t n, const uint32_t *keys,
    int64_t include_only_extendable, int64_t cov_mode, float cov_thr,
    uint32_t *qkey_o, uint32_t *tkey_o, int32_t *score_o, int32_t *diag_o,
    int64_t *group_row_start, int64_t *group_centre, int64_t *n_groups_o)
{
    // ---- global sort (kmermatcher.cpp:409-415) -------------------------
    std::vector<Entry> ent(n);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        ent[i].key = kmer[i] | (1ull << 63);
        ent[i].tie = ((uint64_t)(0xFFFFFF - (uint32_t)seq_len[i]) << 40) |
                     (uint64_t)id[i];
        ent[i].kmer = kmer[i];
        ent[i].pos = pos[i];
        ent[i].seq_len = seq_len[i];
        ent[i].id = id[i];
    }
    parallel_sort2(ent);

    // ---- assignGroup (kmermatcher.cpp:453-562) -------------------------
    // centre = first entry of each equal-key group; singleton groups drop;
    // every kept entry (incl. the rep's own) becomes a pair row.
    std::vector<Pair> pairs;
    pairs.reserve((size_t)n);
    int64_t g0 = 0;
    while (g0 < n) {
        int64_t g1 = g0 + 1;
        while (g1 < n && ent[g1].key == ent[g0].key) g1++;
        if (g1 - g0 > 1) {
            const Entry &rep = ent[g0];
            const bool rep_is_rev = (rep.kmer >> 63) == 0;
            for (int64_t i = g0; i < g1; i++) {
                const Entry &e = ent[i];
                const bool tgt_is_rev = (e.kmer >> 63) == 0;
                const int64_t rep_len = rep.seq_len, t_len = e.seq_len;
                const int64_t q_pos =
                    tgt_is_rev ? rep_len - 1 - rep.pos : rep.pos;
                const int64_t t_pos_adj =
                    tgt_is_rev ? t_len - 1 - e.pos : e.pos;
                const int64_t diagonal = q_pos - t_pos_adj;
                bool keep;
                if (include_only_extendable) {
                    keep = (diagonal < 0) || (diagonal > rep_len - t_len);
                } else {
                    keep = can_cover((int)cov_mode, cov_thr,
                                     (float)rep_len, (float)t_len);
                }
                if (!keep) continue;
                Pair p;
                p.centre = rep.id;
                p.member = e.id;
                p.diag = (int32_t)diagonal;
                p.fwd = (uint8_t)(!(rep_is_rev ^ tgt_is_rev));
                p.k1 = ((uint64_t)(uint32_t)p.centre << 32) |
                       (uint64_t)(uint32_t)p.member;
                p.k2 = (uint32_t)p.diag ^ 0x80000000u;
                pairs.push_back(p);
            }
        }
        g0 = g1;
    }
    ent.clear();
    ent.shrink_to_fit();

    // ---- sort pairs by (centre, member, diag) --------------------------
    parallel_sort2(pairs);

    // ---- writeKmerMatcherResult scan ------------------------------------
    const int64_t np = (int64_t)pairs.size();
    std::vector<int64_t> c(np), m(np);
    std::vector<uint8_t> f(np);
    std::vector<int32_t> d(np);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < np; i++) {
        c[i] = pairs[i].centre;
        m[i] = pairs[i].member;
        d[i] = pairs[i].diag;
        f[i] = pairs[i].fwd;
    }
    pairs.clear();
    pairs.shrink_to_fit();
    return build_pref_scan(c.data(), f.data(), m.data(), d.data(), np,
                           keys, qkey_o, tkey_o, score_o, diag_o,
                           group_row_start, group_centre, n_groups_o);
}

}  // extern "C"
