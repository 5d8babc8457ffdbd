// Probe: compute the Gumbel / finite-size-correction parameters that the
// reference obtains from AlignmentEvaluer::initGapless for the +2/-3
// nucleotide matrix with background 4 x 0.2499975
// (reference: lib/mmseqs/src/alignment/EvalueComputation.h:119-175).
// Compiled against the reference's vendored ALP sources (read-only).
#include <cstdio>
#include "sls_alignment_evaluer.hpp"

int main() {
    const long alphabet = 4;
    long m0[] = {2, -3, -3, -3};
    long m1[] = {-3, 2, -3, -3};
    long m2[] = {-3, -3, 2, -3};
    long m3[] = {-3, -3, -3, 2};
    const long *mat[] = {m0, m1, m2, m3};
    double p[] = {0.2499975, 0.2499975, 0.2499975, 0.2499975};
    Sls::AlignmentEvaluer ev;
    ev.initGapless(alphabet, mat, p, p, 60.0);
    const Sls::ALP_set_of_parameters &par = ev.parameters();
    printf("lambda %.20g\nK %.20g\n", par.lambda, par.K);
    printf("a_J %.20g\nb_J %.20g\na_I %.20g\nb_I %.20g\n",
           par.a_J, par.b_J, par.a_I, par.b_I);
    printf("alpha_J %.20g\nbeta_J %.20g\nalpha_I %.20g\nbeta_I %.20g\n",
           par.alpha_J, par.beta_J, par.alpha_I, par.beta_I);
    printf("sigma %.20g\ntau %.20g\n", par.sigma, par.tau);
    printf("a %.20g\nalpha %.20g\ngapless_a %.20g\ngapless_alpha %.20g\n",
           par.a, par.alpha, par.gapless_a, par.gapless_alpha);
    printf("G %ld G1 %ld G2 %ld\n", par.G, par.G1, par.G2);
    // errors (should be ~0 for gapless exact computation)
    printf("lambda_err %.20g K_err %.20g\n", par.lambda_error, par.K_error);
    return 0;
}
