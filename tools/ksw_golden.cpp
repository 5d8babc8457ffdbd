// Golden harness: vendored ksw_extz2_sse vs our scalar replica.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>
#include "ksw2.h"

// our replica entry
extern "C" int64_t wrapped_banded_align(
    const uint8_t*, int64_t, const uint8_t*, int64_t, int64_t,
    int64_t, int64_t, int64_t, int64_t*);

// expose the scalar extz for direct comparison via a shim in ksw_wrap.cpp?
// Instead: test through the DP by calling ksw_extz2_sse directly here and
// a C wrapper we add below.
extern "C" void extz_scalar_c(int qlen, const uint8_t *query, int tlen,
                              const uint8_t *target, int q, int e, int w,
                              int zdrop, int score_only,
                              int *max, int *max_q, int *max_t,
                              int *zdropped, uint32_t *cigar, int *n_cigar);

static uint64_t rng_state = 42;
static uint32_t rnd() {
    rng_state = rng_state * 6364136223846793005ULL + 1442695040888963407ULL;
    return (uint32_t)(rng_state >> 33);
}

int main() {
    int8_t mat[25];
    for (int i = 0; i < 25; i++) {
        int r = i / 5, c = i % 5;
        mat[i] = (r == c) ? 2 : -3;   // wildcard handled by non-generic flag
    }
    int fails = 0, tests = 0;
    for (int iter = 0; iter < 400; iter++) {
        int qlen = 10 + rnd() % 600;
        int tlen = 10 + rnd() % 600;
        std::vector<uint8_t> q(qlen), t(tlen);
        // correlated sequences so extensions go far sometimes
        for (int i = 0; i < qlen; i++) q[i] = rnd() % 100 < 2 ? 4 : rnd() % 4;
        for (int i = 0; i < tlen; i++) {
            if (i < qlen && rnd() % 100 < 85) t[i] = q[i];
            else t[i] = rnd() % 100 < 2 ? 4 : rnd() % 4;
        }
        for (int so = 0; so < 2; so++) {
            ksw_extz_t ez;
            memset(&ez, 0, sizeof(ez));
            int flag = KSW_EZ_EXTZ_ONLY | (so ? KSW_EZ_SCORE_ONLY : 0);
            ksw_extz2_sse(0, qlen, q.data(), tlen, t.data(), 5, mat,
                          5, 2, 64, 40, flag, &ez);
            int mx, mq, mt, zd, nc = 0;
            std::vector<uint32_t> cig(qlen + tlen + 8);
            extz_scalar_c(qlen, q.data(), tlen, t.data(), 5, 2, 64, 40,
                          so, &mx, &mq, &mt, &zd, cig.data(), &nc);
            tests++;
            bool ok = (int)ez.max == mx && ez.max_q == mq
                      && ez.max_t == mt && (int)ez.zdropped == zd;
            if (!so && ok) {
                ok = nc == ez.n_cigar;
                for (int i = 0; ok && i < nc; i++)
                    ok = cig[i] == ez.cigar[i];
            }
            if (!ok) {
                fails++;
                printf("MISMATCH iter=%d so=%d: ref max=%d q=%d t=%d zd=%d"
                       " | mine max=%d q=%d t=%d zd=%d ncig %d vs %d\n",
                       iter, so, ez.max, ez.max_q, ez.max_t, ez.zdropped,
                       mx, mq, mt, zd, ez.n_cigar, nc);
            }
            if (ez.cigar) free(ez.cigar);
        }
    }
    printf("%d tests, %d failures\n", tests, fails);
    return fails != 0;
}
