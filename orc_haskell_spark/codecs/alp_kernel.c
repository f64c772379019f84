/* ALP encode transform: the single-pass C twin of alp._try_pair +
 * exception extraction (alp.py encode()).
 *
 * Semantics are pinned to the numpy path (_try_pair) bit-for-bit:
 *   d   = (v * f10e) * if10f                (same two-multiply order)
 *   in  = isfinite(d) && fabs(d) < 2^62
 *   i   = rint(d)                           (round-half-to-even, like np.rint)
 *   rec = ((double)i * dec_f) * dec_e       (same two-multiply order as decode)
 *   good = in && bits(rec) == bits(v)       (BIT equality: -0.0, NaN fail)
 * Exceptions (positions + original values) stream out; exception slots
 * in `ints` are back-filled with the good minimum so they add nothing
 * to the downstream frame-of-reference width.
 *
 * No adds anywhere -> no FMA contraction risk under -O3 -march=native;
 * the multiply order is left-associative in both languages.
 */

#include <stdint.h>
#include <string.h>
#include <math.h>

#define ALP_LIMIT 4611686018427387904.0 /* 2^62, exact in f64 */

long alp_encode_f8(const double *v, long n,
                   double f10e, double if10f, double dec_f, double dec_e,
                   int64_t *ints, uint64_t *exc_pos, double *exc_vals)
{
    long n_exc = 0;
    int64_t fill = 0;
    int have_good = 0;
    for (long k = 0; k < n; k++) {
        double d = (v[k] * f10e) * if10f;
        int good = 0;
        int64_t i = 0;
        if (isfinite(d) && fabs(d) < ALP_LIMIT) {
            i = (int64_t)rint(d);
            double rec = ((double)i * dec_f) * dec_e;
            uint64_t rb, vb;
            memcpy(&rb, &rec, 8);
            memcpy(&vb, &v[k], 8);
            good = (rb == vb);
        }
        if (good) {
            ints[k] = i;
            if (!have_good || i < fill) { fill = i; have_good = 1; }
        } else {
            exc_pos[n_exc] = (uint64_t)k;
            exc_vals[n_exc] = v[k];
            n_exc++;
            ints[k] = 0; /* patched below once fill is known */
        }
    }
    if (have_good)
        for (long j = 0; j < n_exc; j++)
            ints[exc_pos[j]] = fill;
    return n_exc;
}

long alp_encode_f4(const float *v, long n,
                   double f10e, double if10f, double dec_f, double dec_e,
                   int64_t *ints, uint64_t *exc_pos, float *exc_vals)
{
    long n_exc = 0;
    int64_t fill = 0;
    int have_good = 0;
    for (long k = 0; k < n; k++) {
        double d = ((double)v[k] * f10e) * if10f;
        int good = 0;
        int64_t i = 0;
        if (isfinite(d) && fabs(d) < ALP_LIMIT) {
            i = (int64_t)rint(d);
            float rec = (float)(((double)i * dec_f) * dec_e);
            uint32_t rb, vb;
            memcpy(&rb, &rec, 4);
            memcpy(&vb, &v[k], 4);
            good = (rb == vb);
        }
        if (good) {
            ints[k] = i;
            if (!have_good || i < fill) { fill = i; have_good = 1; }
        } else {
            exc_pos[n_exc] = (uint64_t)k;
            exc_vals[n_exc] = v[k];
            n_exc++;
            ints[k] = 0;
        }
    }
    if (have_good)
        for (long j = 0; j < n_exc; j++)
            ints[exc_pos[j]] = fill;
    return n_exc;
}
