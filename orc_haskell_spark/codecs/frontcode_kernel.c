/* Front-coding kernels for sorted dictionary payloads.
 *
 * Same semantics as the numpy reference in strings.py: entry i stores
 * the byte length shared with entry i-1 (capped at max_prefix) plus
 * the remaining suffix bytes.  Prefixes chain only through the
 * immediate predecessor, so decode is a strictly sequential copy —
 * which is exactly why it belongs in C: the vectorized numpy decode
 * needs one full-array pass per prefix byte column (<= 255 passes),
 * while this loop touches every output byte once.
 *
 * All loads are bounds-checked against caller-provided sizes so a
 * corrupted stripe returns -1 instead of reading out of bounds.
 */

#include <stdint.h>
#include <string.h>

/* Compute prefix lengths and pack suffix bytes.
 *
 * data/lens: concatenated sorted entries and their byte lengths.
 * plens out: per-entry shared-prefix length (plens[0] = 0).
 * out: suffix bytes (capacity >= total data bytes suffices).
 * Returns total suffix bytes written, or -1 on negative length.
 */
long front_code_encode(const uint8_t *data, const int64_t *lens, long n,
                       int64_t max_prefix, int64_t *plens, uint8_t *out)
{
    long opos = 0;
    int64_t off = 0, prev_off = 0;
    for (long i = 0; i < n; i++) {
        int64_t l = lens[i];
        if (l < 0)
            return -1;
        int64_t p = 0;
        if (i > 0) {
            int64_t lim = lens[i - 1] < l ? lens[i - 1] : l;
            if (lim > max_prefix)
                lim = max_prefix;
            const uint8_t *a = data + prev_off;
            const uint8_t *b = data + off;
            while (p + 8 <= lim) {
                uint64_t x, y;
                memcpy(&x, a + p, 8);
                memcpy(&y, b + p, 8);
                if (x != y) {
                    /* little-endian: lowest differing byte first */
                    p += (int64_t)(__builtin_ctzll(x ^ y) >> 3);
                    goto found;
                }
                p += 8;
            }
            while (p < lim && a[p] == b[p])
                p++;
found:      ;
        }
        plens[i] = p;
        memcpy(out + opos, data + off + p, (size_t)(l - p));
        opos += (long)(l - p);
        prev_off = off;
        off += l;
    }
    return opos;
}

/* Expand (prefix lens, full lens, suffix bytes) back to full bytes.
 *
 * out capacity must be sum(lens).  Returns bytes written, or -1 if the
 * stream is inconsistent (plen exceeding either neighbour length, or
 * suffix bytes overrunning sdata_len).
 */
long front_code_decode(const int64_t *plens, const int64_t *lens, long n,
                       const uint8_t *sdata, long sdata_len, uint8_t *out)
{
    long spos = 0, opos = 0, prev = 0;
    for (long i = 0; i < n; i++) {
        int64_t p = plens[i], l = lens[i];
        if (p < 0 || l < 0 || p > l)
            return -1;
        if (i == 0) {
            if (p != 0)
                return -1;
        } else if (p > lens[i - 1]) {
            return -1;
        }
        int64_t s = l - p;
        if (spos + s > sdata_len)
            return -1;
        memcpy(out + opos, out + prev, (size_t)p);
        memcpy(out + opos + p, sdata + spos, (size_t)s);
        prev = opos;
        opos += (long)l;
        spos += (long)s;
    }
    return opos;
}
