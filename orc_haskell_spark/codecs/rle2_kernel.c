/* RLEv2 stream decoder in C — hot path for codecs/rle2.decode.
 *
 * Semantics mirror the numpy decoder (codecs/rle2.py), which follows
 * the reference (src/Orc/Serial/Binary/Internal/Integers.hs:189-408)
 * and the ORC v1 spec, and is cross-validated against C++-written
 * files and the spec golden vectors. This kernel is validated by the
 * same suites plus a property test asserting value-identical output
 * with the numpy decoder on arbitrary encoder output.
 *
 * Reads up to max_out values (the caller always knows the logical
 * count; trailing runs beyond it are ignored, like the C++ reader).
 * Returns the number of values written, or a negative error code:
 *   -1 truncated buffer   -2 corrupt header/width
 */

#include <stdint.h>

static const int WIDTH_TABLE[32] = {
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64};

/* smallest table width >= bits */
static int closest_width(int bits) {
    for (int i = 0; i < 32; i++)
        if (WIDTH_TABLE[i] >= bits)
            return WIDTH_TABLE[i];
    return 64;
}

static inline uint64_t unzigzag_u64(uint64_t z) {
    return (z >> 1) ^ (~(z & 1) + 1);
}

typedef struct {
    const uint8_t *buf;
    long pos, size;
} Rd;

static int read_be(Rd *r, int nbytes, uint64_t *out) {
    if (r->pos + nbytes > r->size)
        return -1;
    uint64_t v = 0;
    for (int i = 0; i < nbytes; i++)
        v = (v << 8) | r->buf[r->pos++];
    *out = v;
    return 0;
}

static int read_varint(Rd *r, uint64_t *out) {
    uint64_t v = 0;
    int shift = 0;
    while (1) {
        if (r->pos >= r->size || shift > 63)
            return -1;
        uint8_t b = r->buf[r->pos++];
        v |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80))
            break;
        shift += 7;
    }
    *out = v;
    return 0;
}

/* unpack n width-bit values; bounds-checked against the reader */
static int unpack(Rd *r, long n, int width, uint64_t *out) {
    long need = (n * (long)width + 7) / 8;
    if (r->pos + need > r->size)
        return -1;
    const uint8_t *p = r->buf + r->pos;
    unsigned __int128 acc = 0;
    int nb = 0;
    long bp = 0;
    uint64_t mask = width == 64 ? ~0ULL : ((1ULL << width) - 1);
    for (long i = 0; i < n; i++) {
        while (nb < width) {
            acc = (acc << 8) | p[bp++];
            nb += 8;
        }
        out[i] = (uint64_t)(acc >> (nb - width)) & mask;
        nb -= width;
        acc &= (((unsigned __int128)1 << nb) - 1);
    }
    r->pos += need;
    return 0;
}

long rle2_decode(const uint8_t *buf, long size, int signed_, uint64_t *out,
                 long max_out) {
    Rd r = {buf, 0, size};
    long n_out = 0;
    uint64_t scratch[512];
    while (r.pos < r.size && n_out < max_out) {
        uint8_t h0 = r.buf[r.pos];
        int mode = h0 >> 6;
        if (mode == 0) { /* SHORT_REPEAT */
            int width = ((h0 >> 3) & 0x7) + 1;
            int repeats = (h0 & 0x7) + 3;
            r.pos++;
            uint64_t v;
            if (read_be(&r, width, &v))
                return -1;
            if (signed_)
                v = unzigzag_u64(v);
            for (int i = 0; i < repeats && n_out < max_out; i++)
                out[n_out++] = v;
        } else if (mode == 1) { /* DIRECT */
            uint64_t header;
            if (read_be(&r, 2, &header))
                return -1;
            int width = WIDTH_TABLE[(header >> 9) & 0x1F];
            long repeats = (long)(header & 0x1FF) + 1;
            if (unpack(&r, repeats, width, scratch))
                return -1;
            for (long i = 0; i < repeats && n_out < max_out; i++)
                out[n_out++] =
                    signed_ ? unzigzag_u64(scratch[i]) : scratch[i];
        } else if (mode == 2) { /* PATCHED_BASE */
            uint64_t h;
            if (read_be(&r, 4, &h))
                return -1;
            int width = WIDTH_TABLE[(h >> 25) & 0x1F];
            long repeats = (long)((h >> 16) & 0x1FF) + 1;
            int base_width = (int)((h >> 13) & 0x7) + 1;
            int patch_width = WIDTH_TABLE[(h >> 8) & 0x1F];
            int pgw = (int)((h >> 5) & 0x7) + 1;
            int pll = (int)(h & 0x1F);
            uint64_t raw_base;
            if (read_be(&r, base_width, &raw_base))
                return -1;
            uint64_t sign_bit = 1ULL << (8 * base_width - 1);
            uint64_t base = (raw_base & sign_bit)
                ? (uint64_t)(-(int64_t)(raw_base & ~sign_bit))
                : raw_base;
            if (unpack(&r, repeats, width, scratch))
                return -1;
            if (pll) {
                uint64_t entries[32];
                if (patch_width + pgw > 64 || width >= 64)
                    return -2; /* no valid writer emits these with patches */
                int entry_width = closest_width(patch_width + pgw);
                if (unpack(&r, pll, entry_width, entries))
                    return -1;
                long idx = 0;
                uint64_t pmask = patch_width == 64
                    ? ~0ULL : ((1ULL << patch_width) - 1);
                for (int i = 0; i < pll; i++) {
                    idx += (long)(entries[i] >> patch_width);
                    uint64_t pv = entries[i] & pmask;
                    if (idx >= repeats)
                        return -2;
                    scratch[idx] |= pv << width;
                }
            }
            for (long i = 0; i < repeats && n_out < max_out; i++)
                out[n_out++] = scratch[i] + base;
        } else { /* DELTA */
            uint64_t header;
            if (read_be(&r, 2, &header))
                return -1;
            int wcode = (int)((header >> 9) & 0x1F);
            int width = wcode == 0 ? 0 : WIDTH_TABLE[wcode];
            long repeats = (long)(header & 0x1FF) + 1;
            uint64_t bz, dz;
            if (read_varint(&r, &bz) || read_varint(&r, &dz))
                return -1;
            uint64_t base = signed_ ? unzigzag_u64(bz) : bz;
            int64_t d0 = (int64_t)unzigzag_u64(dz);
            uint64_t mag0 = d0 < 0 ? (uint64_t)(-d0) : (uint64_t)d0;
            int neg = d0 < 0;
            if (n_out < max_out)
                out[n_out++] = base;
            if (repeats == 1)
                continue;
            long nd = repeats - 2;
            if (width == 0) {
                uint64_t acc = base;
                for (long i = 0; i < repeats - 1 && n_out < max_out; i++) {
                    acc = neg ? acc - mag0 : acc + mag0;
                    out[n_out++] = acc;
                }
            } else {
                if (unpack(&r, nd, width, scratch))
                    return -1;
                uint64_t acc = base;
                for (long i = 0; i < repeats - 1 && n_out < max_out; i++) {
                    uint64_t m = i == 0 ? mag0 : scratch[i - 1];
                    acc = neg ? acc - m : acc + m;
                    out[n_out++] = acc;
                }
            }
        }
    }
    return n_out;
}
