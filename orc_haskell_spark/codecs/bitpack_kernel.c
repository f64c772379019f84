/* Fixed-width big-endian bit-packing (the RLEv2 "readLongs" kernel,
 * reference csrc/bytes.c:110-138) — C hot paths for codecs/bitpack.py.
 * Output is BYTE-IDENTICAL to the numpy formulation (MSB-first,
 * contiguous, zero-padded tail), so either side can pack/unpack the
 * other's bytes; property-tested both ways.
 */

#include <stdint.h>

/* pack n width-bit values into out (caller sizes (n*width+7)/8) */
void orc_pack_width(const uint64_t *u, long n, int width, uint8_t *out) {
    uint64_t mask = width == 64 ? ~0ULL : ((1ULL << width) - 1);
    unsigned acc = 0;
    int nb = 0;
    long o = 0;
    for (long i = 0; i < n; i++) {
        uint64_t v = u[i] & mask;
        int w = width;
        while (w > 0) {
            int take = 8 - nb;
            if (take > w)
                take = w;
            acc = (acc << take)
                | (unsigned)((v >> (w - take)) & ((1ULL << take) - 1));
            nb += take;
            w -= take;
            if (nb == 8) {
                out[o++] = (uint8_t)acc;
                acc = 0;
                nb = 0;
            }
        }
    }
    if (nb)
        out[o] = (uint8_t)(acc << (8 - nb));
}

/* unpack n width-bit values from buf into out */
void orc_unpack_width(const uint8_t *buf, long n, int width, uint64_t *out) {
    uint64_t mask = width == 64 ? ~0ULL : ((1ULL << width) - 1);
    unsigned __int128 acc = 0; /* bit staging can hold width-1+8 bits */
    int nb = 0;
    long p = 0;
    for (long i = 0; i < n; i++) {
        while (nb < width) {
            acc = (acc << 8) | buf[p++];
            nb += 8;
        }
        out[i] = (uint64_t)(acc >> (nb - width)) & mask;
        nb -= width;
        acc &= (((unsigned __int128)1 << nb) - 1);
    }
}
