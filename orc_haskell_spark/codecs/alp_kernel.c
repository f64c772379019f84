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

/* ALP-RD split: the single-pass C twin of alp.rd_encode / rd_decode.
 *
 * Encode semantics pinned to the numpy path bit-for-bit:
 *   left  = bits(v) >> r            (uint16; r >= 16 for f8, >= 16 for f4)
 *   right = bits(v) & ((1<<r)-1)    (stored widened to uint64)
 *   code  = searchsorted(dict, left) clamped to dn-1   (dict sorted, dn<=8)
 *   good  = dict[code] == left; bad slots -> code 0 + (pos, left) exception
 * Decode reassembles (dict[code] << r) | right into raw bit patterns;
 * exception scatter stays in numpy (O(n_exc)).
 */

static inline int rd_lookup(const uint16_t *dict, int dn, uint16_t left)
{
    int idx = 0;
    for (int i = 0; i < dn; i++)       /* branch-free searchsorted, dn<=8 */
        idx += dict[i] < left;
    return idx < dn ? idx : dn - 1;
}

long alp_rd_encode_f8(const double *v, long n, int r,
                      const uint16_t *dict, int dn,
                      uint64_t *codes, uint64_t *right,
                      uint64_t *exc_pos, uint16_t *exc_left)
{
    const uint64_t mask = (r >= 64) ? ~0ULL : ((1ULL << r) - 1);
    long n_exc = 0;
    for (long k = 0; k < n; k++) {
        uint64_t bits;
        memcpy(&bits, &v[k], 8);
        uint16_t left = (uint16_t)(bits >> r);
        right[k] = bits & mask;
        int idx = rd_lookup(dict, dn, left);
        if (dict[idx] == left) {
            codes[k] = (uint64_t)idx;
        } else {
            codes[k] = 0;
            exc_pos[n_exc] = (uint64_t)k;
            exc_left[n_exc] = left;
            n_exc++;
        }
    }
    return n_exc;
}

long alp_rd_encode_f4(const float *v, long n, int r,
                      const uint16_t *dict, int dn,
                      uint64_t *codes, uint64_t *right,
                      uint64_t *exc_pos, uint16_t *exc_left)
{
    const uint64_t mask = (1ULL << r) - 1;
    long n_exc = 0;
    for (long k = 0; k < n; k++) {
        uint32_t bits;
        memcpy(&bits, &v[k], 4);
        uint16_t left = (uint16_t)(bits >> r);
        right[k] = (uint64_t)bits & mask;
        int idx = rd_lookup(dict, dn, left);
        if (dict[idx] == left) {
            codes[k] = (uint64_t)idx;
        } else {
            codes[k] = 0;
            exc_pos[n_exc] = (uint64_t)k;
            exc_left[n_exc] = left;
            n_exc++;
        }
    }
    return n_exc;
}

void alp_rd_decode(const uint64_t *codes, const uint64_t *right, int r,
                   const uint16_t *dict, long dn, long n,
                   uint64_t *out_bits)
{
    /* clamp codes against the dictionary size: a corrupt/truncated
       stripe must not read out of bounds (the numpy twin raises) */
    if (dn <= 0) {               /* empty dictionary: nothing to read */
        for (long k = 0; k < n; k++)
            out_bits[k] = right[k];
        return;
    }
    for (long k = 0; k < n; k++) {
        uint64_t c = codes[k] < (uint64_t)dn ? codes[k] : 0;
        out_bits[k] = ((uint64_t)dict[c] << r) | right[k];
    }
}
