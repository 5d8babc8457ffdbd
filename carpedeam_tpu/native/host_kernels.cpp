// Native host runtime: per-pair overlap scoring and correction coverage
// accumulation.
//
// These are the host-side (CPU fallback / verification) implementations of
// the two hot batched stages.  The device path (ops/rescore_tpu.py,
// ops/correction_tpu.py) runs the same math as dense XLA kernels on the
// accelerator; this C++ serves hosts without an accelerator at reference
// speed instead of paying NumPy's dense-padded-window materialisation.
// Semantics mirror the reference exactly:
//   - scoring: DistanceCalculator::computeUngappedAlignment, END_TO_END
//     mode (+2/-3 over the full overlap, two ushort diagonal candidates,
//     ties favour the negative candidate; lib/mmseqs/src/alignment/
//     DistanceCalculator.h:93-220, rescorediagonal.cpp:146-270)
//   - correction accumulation: read filters + countDeamCov stacking
//     (src/assembler/correction.cpp:200-392)
//
// OpenMP parallel over pairs/records like the reference's
// `#pragma omp parallel for schedule(dynamic)` loops.
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// 5-letter code fold (NucleotideMatrix::setupLetterMapping): A0 C1 T2 G3 X4
struct Tables {
    uint8_t code[256];
    uint8_t revcomp_x[256];   // char -> complement char via "ACTGX" decode
    uint8_t revcomp_n[256];   // char -> complement char via "ACTGN" decode
    uint8_t ry[256];          // purine/pyrimidine class ('C'/'T' -> 1)
    uint8_t acgt[256];        // nucleotideMap (A0 C1 G2 T3, else 0)
    Tables() {
        memset(code, 4, sizeof(code));
        const char *a = "Aa", *c = "CcMmYyHh", *t = "TtUuWw",
                   *g = "GgKkBbDdVvRrSs";
        for (const char *p = a; *p; p++) code[(uint8_t)*p] = 0;
        for (const char *p = c; *p; p++) code[(uint8_t)*p] = 1;
        for (const char *p = t; *p; p++) code[(uint8_t)*p] = 2;
        for (const char *p = g; *p; p++) code[(uint8_t)*p] = 3;
        const char dec_x[6] = "ACTGX";
        const char dec_n[6] = "ACTGN";
        static const uint8_t comp[5] = {2, 3, 0, 1, 4};
        for (int i = 0; i < 256; i++) {
            revcomp_x[i] = (uint8_t)dec_x[comp[code[i]]];
            revcomp_n[i] = (uint8_t)dec_n[comp[code[i]]];
        }
        memset(ry, 0, sizeof(ry));
        ry[(uint8_t)'C'] = 1;
        ry[(uint8_t)'T'] = 1;
        memset(acgt, 0, sizeof(acgt));
        acgt[(uint8_t)'C'] = 1;
        acgt[(uint8_t)'G'] = 2;
        acgt[(uint8_t)'T'] = 3;
    }
};
const Tables T;

inline uint8_t upper(uint8_t b) { return b & 0xDF; }

}  // namespace

extern "C" {

// Score all (query, target, diagonal) candidates end-to-end.
// diag: raw prefilter diagonal (int16-truncated, sign-extended to i32).
// Outputs (per pair): score, qstart, qend, tstart, tend, aln_len, id_cnt.
void score_pairs(
    const uint8_t *data, const int64_t *offsets, const int64_t *lengths,
    const int32_t *qid, const int32_t *tid, const int32_t *diag,
    const uint8_t *is_rev, int64_t n_pairs,
    int32_t *score_o, int32_t *qstart_o, int32_t *qend_o,
    int32_t *tstart_o, int32_t *tend_o, int32_t *aln_len_o,
    int32_t *id_cnt_o)
{
#pragma omp parallel for schedule(dynamic, 256)
    for (int64_t i = 0; i < n_pairs; i++) {
        const int64_t q = qid[i], t = tid[i];
        const int64_t ql = lengths[q], tl = lengths[t];
        const uint8_t *qs = data + offsets[q];
        const uint8_t *ts = data + offsets[t];
        const bool rev = is_rev[i] != 0;
        const int64_t du = (int64_t)((uint32_t)diag[i] & 0xFFFFu);

        // query byte at strand-corrected position p
        auto qbyte = [&](int64_t p) -> uint8_t {
            return rev ? T.revcomp_x[qs[ql - 1 - p]] : qs[p];
        };

        int64_t best_score = 0, best_cand = 0, best_len = 0;
        bool got = false;
        const int64_t cands[2] = {du - 65536, du};
        for (int ci = 0; ci < 2; ci++) {
            const int64_t cand = cands[ci];
            const bool neg = cand < 0;
            const int64_t dist = neg ? -cand : cand;
            const bool valid = neg ? (dist < tl) : (dist < ql);
            if (!valid) continue;
            const int64_t min_len =
                neg ? (tl - dist < ql ? tl - dist : ql)
                    : (tl < ql - dist ? tl : ql - dist);
            const int64_t qoff = neg ? 0 : dist;
            const int64_t toff = neg ? dist : 0;
            int64_t m = 0;
            for (int64_t p = 0; p < min_len; p++) {
                const uint8_t qc = T.code[qbyte(qoff + p)];
                const uint8_t tc = T.code[ts[toff + p]];
                m += (qc == tc && qc < 4);
            }
            int64_t sc = 2 * m - 3 * (min_len - m);
            if (sc < 0) sc = 0;
            if (sc > best_score) {   // strict: ties favour the neg candidate
                best_score = sc;
                best_cand = cand;
                best_len = min_len;
                got = true;
            }
        }

        int64_t start = got ? 0 : -1;
        int64_t end = got ? best_len - 1 : -1;
        const int64_t dist = got ? (best_cand < 0 ? -best_cand : best_cand) : 0;
        const bool dneg = got && best_cand < 0;
        const int64_t qstart = dneg ? start : start + dist;
        const int64_t qend = dneg ? end : end + dist;
        const int64_t tstart = dneg ? start + dist : start;
        const int64_t tend = dneg ? end + dist : end;
        const int64_t aln_len = end - start + 1;

        // NumPy-oracle boundary semantics: indices clip at 0 (so the
        // invalid-hit window [-1,-1] reads the first characters) and
        // positions past the sequence end read the 0 padding byte.
        int64_t idc = 0;
        for (int64_t p = 0; p < aln_len; p++) {
            int64_t qp = qstart + p, tp = tstart + p;
            if (qp < 0) qp = 0;
            if (tp < 0) tp = 0;
            const uint8_t qch = upper(qp < ql ? qbyte(qp) : 0);
            const uint8_t tch = upper(tp < tl ? ts[tp] : 0);
            idc += (qch == tch);
        }

        score_o[i] = (int32_t)best_score;
        qstart_o[i] = (int32_t)qstart;
        qend_o[i] = (int32_t)qend;
        tstart_o[i] = (int32_t)tstart;
        tend_o[i] = (int32_t)tend;
        aln_len_o[i] = (int32_t)aln_len;
        id_cnt_o[i] = (int32_t)idc;
    }
}

// Correction coverage accumulation: per record, RY-identity filter then
// scatter target-base x damage-layer counts onto the query's global
// positions.  counts / rev_counts are (total_len * 44) int32, additive.
void correction_accumulate(
    const uint8_t *data, const int64_t *offsets, const int64_t *lengths,
    const int32_t *rec_q, const int32_t *rec_t, const uint8_t *rec_is_rev,
    const int32_t *rec_qstart, const int32_t *rec_tstart,
    const int32_t *rec_alen, const uint8_t *rec_keep_pre,
    const int32_t *rec_ry_smin, int64_t n_rec,
    int32_t *counts, int32_t *rev_counts)
{
    // accumulation per record is scatter into a shared array; records of
    // the same query never run concurrently if we parallelise by query --
    // but records are grouped by query in the alignment DB, so chunks of
    // the record range mostly touch disjoint query ranges.  Use atomics.
#pragma omp parallel for schedule(dynamic, 256)
    for (int64_t r = 0; r < n_rec; r++) {
        if (!rec_keep_pre[r]) continue;
        const int64_t q = rec_q[r], t = rec_t[r];
        const int64_t tl = lengths[t];
        const uint8_t *qb = data + offsets[q];
        const uint8_t *tb = data + offsets[t];
        const bool rev = rec_is_rev[r] != 0;
        const int64_t qst = rec_qstart[r], tst = rec_tstart[r];
        const int64_t alen = rec_alen[r];

        auto tbyte = [&](int64_t p) -> uint8_t {
            return rev ? T.revcomp_n[tb[tl - 1 - p]] : tb[p];
        };

        int64_t ry_matches = 0;
        for (int64_t p = 0; p < alen; p++)
            ry_matches += (T.ry[qb[qst + p]] == T.ry[tbyte(tst + p)]);
        if (ry_matches < rec_ry_smin[r]) continue;

        const int64_t goff = offsets[q];
        for (int64_t p = 0; p < alen; p++) {
            const int64_t t_real = tst + p;
            const uint8_t tch = tbyte(t_real);
            const int64_t base = T.acgt[tch];
            // layer_index semantics: 5' band, interior 5, 3' band wins on
            // overlap (sequences shorter than 10; nuclassembleUtil.cpp:130)
            int64_t layer = (t_real < 5) ? t_real : 5;
            if (t_real >= tl - 5) layer = 6 + (t_real - (tl - 5));
            const int64_t slot = (goff + qst + p) * 44 + base * 11 + layer;
#pragma omp atomic
            counts[slot]++;
            if (rev) {
#pragma omp atomic
                rev_counts[slot]++;
            }
        }
    }
}

}  // extern "C"
