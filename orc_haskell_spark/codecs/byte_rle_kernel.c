/* ORC byte-RLE kernels in C — hot path for codecs/byte_rle
 * (PRESENT validity streams, BOOLEAN/BYTE data, union tags). The
 * Python/numpy implementations loop per run/segment, which on
 * realistic mostly-set PRESENT streams (alternating short runs and
 * literal groups) measures ~3-5 MB/s; these kernels are the same
 * semantics (Bytes.hs:103-201 mirror) scanned byte-at-a-time in C.
 *
 * byte_rle_decode_size: first pass, returns the decoded length or -1
 * on a truncated stream (callers allocate exactly).
 * byte_rle_decode: fills out; returns values written (stops cleanly
 * at max_out — callers wanting the whole stream size it via
 * byte_rle_decode_size; callers wanting a bounded prefix pass their
 * limit), -1 on a truncated stream.
 * byte_rle_encode: returns bytes written; output is BYTE-IDENTICAL to
 * the numpy encoder (maximal equal segments; runs >= 3 values, max
 * 130 with no sub-minimum tail; literal groups of <= 128). Caller
 * provides capacity >= n + n/128 + 2.
 */

#include <stdint.h>
#include <string.h>

long byte_rle_decode_size(const uint8_t *buf, long size) {
    long pos = 0, w = 0;
    while (pos < size) {
        uint8_t h = buf[pos++];
        if (h < 128) {
            if (pos >= size)
                return -1;
            pos++;
            w += (long)h + 3;
        } else {
            long cnt = 256 - (long)h;
            if (pos + cnt > size)
                return -1;
            pos += cnt;
            w += cnt;
        }
    }
    return w;
}

long byte_rle_decode(const uint8_t *buf, long size, uint8_t *out,
                     long max_out) {
    long pos = 0, w = 0;
    while (pos < size) {
        uint8_t h = buf[pos++];
        if (h < 128) {
            long run = (long)h + 3;
            if (pos >= size)
                return -1;
            if (w + run > max_out)
                run = max_out - w;
            memset(out + w, buf[pos++], (size_t)run);
            w += run;
        } else {
            long cnt = 256 - (long)h;
            if (pos + cnt > size)
                return -1;
            long take = cnt;
            if (w + take > max_out)
                take = max_out - w;
            memcpy(out + w, buf + pos, (size_t)take);
            pos += cnt;
            w += take;
        }
        if (w == max_out)
            return w;
    }
    return w;
}

static void emit_literals(const uint8_t *a, long start, long end,
                          uint8_t *out, long *w) {
    long pos = start;
    while (pos < end) {
        long chunk = end - pos;
        if (chunk > 128)
            chunk = 128;
        out[(*w)++] = (uint8_t)(256 - chunk);
        memcpy(out + *w, a + pos, (size_t)chunk);
        *w += chunk;
        pos += chunk;
    }
}

long byte_rle_encode(const uint8_t *a, long n, uint8_t *out) {
    long w = 0, lit_from = 0, i = 0;
    while (i < n) {
        long j = i + 1;
        while (j < n && a[j] == a[i])
            j++;
        long seg = j - i;
        if (seg >= 3) {
            emit_literals(a, lit_from, i, out, &w);
            long length = seg;
            uint8_t v = a[i];
            while (length >= 3) {
                long chunk = length < 130 ? length : 130;
                /* never leave a 1-2 value tail after a max run */
                if (length - chunk > 0 && length - chunk < 3)
                    chunk = length - 3;
                out[w++] = (uint8_t)(chunk - 3);
                out[w++] = v;
                length -= chunk;
            }
            if (length) { /* tail < 3 -> its own literal group */
                out[w++] = (uint8_t)(256 - length);
                for (long k = 0; k < length; k++)
                    out[w++] = v;
            }
            lit_from = j;
        }
        i = j;
    }
    emit_literals(a, lit_from, n, out, &w);
    return w;
}
