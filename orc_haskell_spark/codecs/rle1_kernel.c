/* RLEv1 stream decoder in C — hot path for codecs/rle1.decode
 * (hive-0.11 ORC files). Semantics mirror the numpy decoder, which
 * follows the reference (Integers.hs:144-172): header h < 128 = run of
 * h+3 values from a varint start with a fixed signed-byte delta in the
 * value domain (modular); h >= 128 = 256-h literal varints. Signed
 * streams zigzag each varint. Returns values written or -1 on a
 * truncated buffer.
 */

#include <stdint.h>

static int rd_varint(const uint8_t *buf, long size, long *pos,
                     uint64_t *out) {
    uint64_t v = 0;
    int shift = 0;
    while (1) {
        if (*pos >= size || shift > 63)
            return -1;
        uint8_t b = buf[(*pos)++];
        v |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80))
            break;
        shift += 7;
    }
    *out = v;
    return 0;
}

static inline uint64_t unzz(uint64_t z) {
    return (z >> 1) ^ (~(z & 1) + 1);
}

long rle1_decode(const uint8_t *buf, long size, int signed_,
                 uint64_t *out, long max_out) {
    long pos = 0, n_out = 0;
    while (pos < size && n_out < max_out) {
        uint8_t h = buf[pos++];
        if (h < 128) { /* run */
            long run = (long)h + 3;
            if (pos >= size)
                return -1;
            int64_t delta = (int8_t)buf[pos++];
            uint64_t start;
            if (rd_varint(buf, size, &pos, &start))
                return -1;
            if (signed_)
                start = unzz(start);
            uint64_t v = start;
            for (long i = 0; i < run && n_out < max_out; i++) {
                out[n_out++] = v;
                v += (uint64_t)delta; /* modular, matches numpy */
            }
        } else { /* literals */
            long cnt = 256 - (long)h;
            for (long i = 0; i < cnt && n_out < max_out; i++) {
                uint64_t v;
                if (rd_varint(buf, size, &pos, &v))
                    return -1;
                out[n_out++] = signed_ ? unzz(v) : v;
            }
        }
    }
    return n_out;
}
