/* FSST hot-path kernels: sequential greedy compress + decompress.
 *
 * Compiled on demand by codecs/native.py (cc -O3 -shared); the numpy
 * implementation in codecs/fsst.py is the always-available fallback and
 * the semantics reference. This is the project's substitute for the
 * reference's C kernels (/root/reference/csrc/bytes.c:110-138): the
 * greedy longest-match byte loop is inherently sequential, which numpy
 * can only approximate with a lockstep block parse — in C it is a
 * straight loop at memory speed.
 *
 * Table layout matches fsst.SymbolTable exactly (same arrays, zero
 * conversion): 64K hash slots keyed on the first 3 bytes for symbols of
 * length >= 3 (combo = code<<8 | len; empty slots hold an impossible
 * all-ones key), a 64K direct table for 2-byte symbols, a 256 table for
 * singles, code 255 escaping one literal byte.
 *
 * Any greedy segmentation decodes identically, so the C output may
 * differ byte-for-byte from the numpy encoder (no 4 KiB block-edge
 * match guards -> slightly better ratio) while remaining fully
 * decodable by either decoder.
 */

#include <stdint.h>
#include <string.h>

#define ESCAPE 255
#define HASH_P 0x9E3779B97F4A7C15ULL

static const uint64_t MASKS[9] = {
    0ULL,
    0xFFULL, 0xFFFFULL, 0xFFFFFFULL, 0xFFFFFFFFULL,
    0xFFFFFFFFFFULL, 0xFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFULL,
    0xFFFFFFFFFFFFFFFFULL,
};

static inline uint64_t load8(const uint8_t *p) {
    uint64_t w;
    memcpy(&w, p, 8); /* little-endian hosts only (x86-64 / aarch64) */
    return w;
}

/* Greedy FSST encode. out must hold >= 2*n bytes. Returns bytes written. */
long fsst_compress(const uint8_t *data, long n,
                   const uint64_t *slot_key, const uint16_t *slot_combo,
                   const int16_t *pair_code, const int16_t *single_code,
                   uint8_t *out) {
    long i = 0, o = 0;
    const long body = n - 8; /* positions with a full unpadded window */
    while (i <= body) {
        uint64_t w = load8(data + i);
        uint64_t h = ((w & 0xFFFFFFULL) * HASH_P) >> 48;
        uint32_t combo = slot_combo[h];
        uint32_t cl = combo & 0xFFu;
        if ((w & MASKS[cl]) == slot_key[h]) {
            out[o++] = (uint8_t)(combo >> 8);
            i += cl;
            continue;
        }
        int16_t c2 = pair_code[w & 0xFFFFULL];
        if (c2 >= 0) {
            out[o++] = (uint8_t)c2;
            i += 2;
            continue;
        }
        int16_t c1 = single_code[data[i]];
        if (c1 >= 0) {
            out[o++] = (uint8_t)c1;
            i += 1;
            continue;
        }
        out[o++] = ESCAPE;
        out[o++] = data[i];
        i += 1;
    }
    /* tail: zero-padded window, match length clamped to the remainder */
    while (i < n) {
        uint8_t tail[8] = {0};
        long left = n - i;
        memcpy(tail, data + i, (size_t)left);
        uint64_t w = load8(tail);
        uint64_t h = ((w & 0xFFFFFFULL) * HASH_P) >> 48;
        uint32_t combo = slot_combo[h];
        uint32_t cl = combo & 0xFFu;
        if ((long)cl <= left && (w & MASKS[cl]) == slot_key[h]) {
            out[o++] = (uint8_t)(combo >> 8);
            i += cl;
            continue;
        }
        if (left >= 2) {
            int16_t c2 = pair_code[w & 0xFFFFULL];
            if (c2 >= 0) {
                out[o++] = (uint8_t)c2;
                i += 2;
                continue;
            }
        }
        int16_t c1 = single_code[data[i]];
        if (c1 >= 0) {
            out[o++] = (uint8_t)c1;
            i += 1;
            continue;
        }
        out[o++] = ESCAPE;
        out[o++] = data[i];
        i += 1;
    }
    return o;
}

/* Greedy parse recording tokens instead of emitting codes (training
 * needs positions/codes/lengths to count adjacent concatenations).
 * pos/codes/lens must each hold n entries. code -1 = escape (1 byte).
 * Returns the token count. */
long fsst_parse(const uint8_t *data, long n,
                const uint64_t *slot_key, const uint16_t *slot_combo,
                const int16_t *pair_code, const int16_t *single_code,
                int32_t *pos, int16_t *codes, uint8_t *lens) {
    long i = 0, t = 0;
    while (i < n) {
        long left = n - i;
        uint64_t w;
        if (left >= 8) {
            w = load8(data + i);
        } else {
            uint8_t tail[8] = {0};
            memcpy(tail, data + i, (size_t)left);
            w = load8(tail);
        }
        uint64_t h = ((w & 0xFFFFFFULL) * HASH_P) >> 48;
        uint32_t combo = slot_combo[h];
        uint32_t cl = combo & 0xFFu;
        if ((long)cl <= left && (w & MASKS[cl]) == slot_key[h]) {
            pos[t] = (int32_t)i;
            codes[t] = (int16_t)(combo >> 8);
            lens[t++] = (uint8_t)cl;
            i += cl;
            continue;
        }
        if (left >= 2) {
            int16_t c2 = pair_code[w & 0xFFFFULL];
            if (c2 >= 0) {
                pos[t] = (int32_t)i;
                codes[t] = c2;
                lens[t++] = 2;
                i += 2;
                continue;
            }
        }
        int16_t c1 = single_code[data[i]];
        pos[t] = (int32_t)i;
        codes[t] = c1; /* -1 when the byte has no code: escape */
        lens[t++] = 1;
        i += 1;
    }
    return t;
}

/* FSST decode. flat/offsets/lens describe the symbol table (offsets has
 * n_syms+1 entries). out must hold >= 8*n + 8 bytes (caller sizes it by
 * the exact expanded length when known; the +8 slack lets the symbol
 * copy be one unconditional 8-byte store). Returns bytes written, or -1
 * if a non-escape code >= n_syms is seen (corrupt payload). */
long fsst_decompress(const uint8_t *c, long n,
                     const uint8_t *flat, const int64_t *offsets,
                     const int64_t *lens, long n_syms,
                     uint8_t *out) {
    long i = 0, o = 0;
    while (i < n) {
        uint8_t code = c[i++];
        if (code == ESCAPE) {
            if (i >= n)
                break; /* dangling escape marker: nothing to emit */
            out[o++] = c[i++];
            continue;
        }
        if (code >= n_syms)
            return -1;
        memcpy(out + o, flat + offsets[code], 8);
        o += lens[code];
    }
    return o;
}
