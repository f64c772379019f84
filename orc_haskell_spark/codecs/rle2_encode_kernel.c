/* RLEv2 stream ENCODER in C — hot path for codecs/rle2.encode.
 *
 * BYTE-IDENTICAL port of the numpy encoder in codecs/rle2.py (which is
 * spec-derived; the reference has no RLEv2 writer): same per-512-window
 * exact byte-cost argmin over short-repeat / delta / patched-base /
 * direct, same tie order (direct < delta < patched), same ordered
 * width candidates (p90 first). Byte identity is asserted by a
 * hypothesis property test against the numpy encoder, and the output
 * is further validated by the C++ ORC reader cross-tests.
 */

#include <stdint.h>
#include <string.h>

extern void orc_pack_width(const uint64_t *u, long n, int width,
                           uint8_t *out);

static const int WTAB[32] = {
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64};

static int wclosest(int bits) {
    if (bits < 1)
        bits = 1;
    for (int i = 0; i < 32; i++)
        if (WTAB[i] >= bits)
            return WTAB[i];
    return 64;
}

static int wcode(int width) {
    for (int i = 0; i < 32; i++)
        if (WTAB[i] == width)
            return i;
    return 31;
}

static inline int bitlen_u64(uint64_t v) {
    return v ? 64 - __builtin_clzll(v) : 0;
}

static inline uint64_t zz64(int64_t v) {
    return ((uint64_t)v << 1) ^ (uint64_t)(v >> 63);
}

static int varint_len(uint64_t v) {
    int n = 1;
    while (v >>= 7)
        n++;
    return n;
}

static long put_varint(uint8_t *out, long o, uint64_t v) {
    while (v >= 0x80) {
        out[o++] = (uint8_t)(v | 0x80);
        v >>= 7;
    }
    out[o++] = (uint8_t)v;
    return o;
}

static long put_be(uint8_t *out, long o, uint64_t v, int nbytes) {
    for (int i = nbytes - 1; i >= 0; i--)
        out[o++] = (uint8_t)(v >> (8 * i));
    return o;
}

/* ---- delta plan ---- */
typedef struct {
    int ok, width, fixed;
    uint64_t base_u; /* wire varint payload value */
    int64_t d0;
    uint64_t mags[511];
    long cost;
} DeltaPlan;

static void plan_delta(const uint64_t *wu, long n, int signed_,
                       DeltaPlan *p) {
    p->ok = 0;
    if (n < 2)
        return;
    /* diffs as signed magnitudes with direction checks */
    int64_t di0 = 0;
    int non_dec = 1, non_inc = 1;
    for (long i = 1; i < n; i++) {
        uint64_t a = wu[i - 1], b = wu[i];
        int inc; /* b >= a in the VALUE domain */
        if (signed_)
            inc = (int64_t)b >= (int64_t)a;
        else
            inc = b >= a;
        uint64_t mag = inc ? b - a : a - b;
        /* numpy accepts a DECREASING diff of exactly -2^63 (the wrapped
         * int64 still agrees in sign); only +2^63 is unencodable */
        if ((mag >> 63) && (inc || mag != (1ULL << 63)))
            return;
        if (!inc && mag)
            non_dec = 0;
        if (inc && mag)
            non_inc = 0;
        if (i == 1)
            di0 = (int64_t)(inc ? mag : (0 - mag));
        p->mags[i - 1] = mag;
    }
    if (!(non_dec || non_inc))
        return;
    /* sign comes from the first delta; 0 would decode as '+' */
    if (non_inc && di0 == 0) {
        for (long i = 0; i < n - 1; i++)
            if (p->mags[i])
                return;
    }
    /* monotone + shared direction: equal magnitudes <=> equal signed
     * deltas, which is numpy's (di == di[0]).all() fixed test */
    int fixed = 1;
    for (long i = 1; i < n - 1; i++)
        if (p->mags[i] != p->mags[0]) {
            fixed = 0;
            break;
        }
    p->fixed = fixed;
    p->base_u = signed_ ? zz64((int64_t)wu[0]) : wu[0];
    p->d0 = di0;
    int width = 0;
    long packed_len = 0;
    if (!fixed) {
        int maxb = 0;
        for (long i = 1; i < n - 1; i++) {
            int b = bitlen_u64(p->mags[i]);
            if (b > maxb)
                maxb = b;
        }
        width = wclosest(maxb);
        if (width < 2)
            width = 2; /* code 0 reserved for fixed-delta */
        packed_len = ((n - 2) * (long)width + 7) / 8;
    }
    p->width = width;
    p->cost = 2 + varint_len(p->base_u) + varint_len(zz64(di0))
        + packed_len;
    p->ok = 1;
}

/* ---- patched plan ---- */
typedef struct {
    int ok, width, base_width, pw, pgw, pll;
    int64_t base;
    uint64_t entries[32];
    long cost;
} PatchPlan;

static void plan_patched_at(const uint64_t *reduced, const uint8_t *bl,
                            long n, int width, int64_t base,
                            int base_width, PatchPlan *p) {
    p->ok = 0;
    long over[512];
    int n_over = 0;
    for (long i = 0; i < n; i++)
        if (bl[i] > width) {
            if (n_over == 32)
                return; /* > 31 even before gap splitting */
            over[n_over++] = i;
        }
    if (n_over > 31)
        return;
    uint64_t entries[32];
    int pll, pw, pgw;
    if (n_over == 0) {
        /* C++ readers reject pl==0: emit one no-op patch (gap0,val0) */
        entries[0] = 0;
        pll = 1;
        pw = 1;
        pgw = 1;
    } else {
        uint64_t pvals[32];
        long gaps[32];
        for (int i = 0; i < n_over; i++) {
            pvals[i] = reduced[over[i]] >> width;
            gaps[i] = over[i] - (i ? over[i - 1] : 0);
        }
        /* gaps > 255 need dummy entries (gap 255, patch 0) */
        uint64_t pv2[64];
        long g2[64];
        int m = 0;
        for (int i = 0; i < n_over; i++) {
            long g = gaps[i];
            while (g > 255) {
                if (m == 64)
                    return;
                g2[m] = 255;
                pv2[m++] = 0;
                g -= 255;
            }
            if (m == 64)
                return;
            g2[m] = g;
            pv2[m++] = pvals[i];
        }
        if (m > 31)
            return;
        pll = m;
        int maxpb = 0;
        long maxg = 0;
        for (int i = 0; i < m; i++) {
            int b = bitlen_u64(pv2[i]);
            if (b > maxpb)
                maxpb = b;
            if (g2[i] > maxg)
                maxg = g2[i];
        }
        pw = wclosest(maxpb);
        pgw = 1;
        while ((1L << pgw) <= maxg && pgw < 63)
            pgw++;
        if (pgw < 1)
            pgw = 1;
        if (pw + pgw > 64)
            return;
        for (int i = 0; i < m; i++)
            entries[i] = ((uint64_t)g2[i] << pw) | pv2[i];
    }
    long data_len = (n * (long)width + 7) / 8;
    long patch_len = (pll * (long)wclosest(pw + pgw) + 7) / 8;
    p->ok = 1;
    p->width = width;
    p->base = base;
    p->base_width = base_width;
    p->pw = pw;
    p->pgw = pgw;
    p->pll = pll;
    memcpy(p->entries, entries, sizeof(uint64_t) * (size_t)pll);
    p->cost = 4 + base_width + data_len + patch_len;
}

static void plan_patched(const uint64_t *wu, long n, int signed_,
                         uint64_t *reduced, PatchPlan *p) {
    p->ok = 0;
    /* base = min in the value domain */
    uint64_t mn = wu[0];
    if (signed_) {
        for (long i = 1; i < n; i++)
            if ((int64_t)wu[i] < (int64_t)mn)
                mn = wu[i];
    } else {
        for (long i = 1; i < n; i++)
            if (wu[i] < mn)
                mn = wu[i];
    }
    int64_t base;
    uint64_t mag;
    if (signed_) {
        base = (int64_t)mn;
        mag = base < 0 ? (uint64_t)(-base) : (uint64_t)base;
    } else {
        base = (int64_t)mn; /* only used if mag fits 63 bits */
        mag = mn;
    }
    if (bitlen_u64(mag) > 63)
        return;
    /* numpy: max(1, (mag.bit_length() + 8) // 8) — +1 sign bit */
    int base_width = (bitlen_u64(mag) + 8) / 8;
    if (base_width < 1)
        base_width = 1;
    uint8_t bl[512];
    int maxb = 0;
    int hist[65];
    memset(hist, 0, sizeof(hist));
    for (long i = 0; i < n; i++) {
        reduced[i] = wu[i] - mn;
        int b = bitlen_u64(reduced[i]);
        bl[i] = (uint8_t)b;
        hist[b]++;
        if (b > maxb)
            maxb = b;
    }
    int w100 = wclosest(maxb);
    /* p90 = k-th order statistic, k = max(0, int(0.9*(n-1))) */
    long k = (long)(0.9 * (double)(n - 1));
    if (k < 0)
        k = 0;
    int p90 = 0;
    long seen = 0;
    for (int b = 0; b <= 64; b++) {
        seen += hist[b];
        if (seen > k) {
            p90 = b;
            break;
        }
    }
    int w90 = wclosest(p90 ? p90 : 1);
    PatchPlan cand;
    plan_patched_at(reduced, bl, n, w90, base, base_width, p);
    if (w100 != w90) {
        plan_patched_at(reduced, bl, n, w100, base, base_width, &cand);
        if (cand.ok && (!p->ok || cand.cost < p->cost))
            *p = cand;
    }
}

/* encode values into out; returns bytes written.
 * out must hold >= ((n+511)/512) * (16 + 512*8 + 64) bytes. */
long rle2_encode(const uint64_t *vals, long n_total, int signed_,
                 uint8_t *out) {
    long o = 0;
    uint64_t zz[512], reduced[512], tmp[512];
    for (long start = 0; start < n_total; start += 512) {
        const uint64_t *wu = vals + start;
        long n = n_total - start < 512 ? n_total - start : 512;
        if (n == 0)
            break;
        /* wire domain for direct/short-repeat */
        for (long i = 0; i < n; i++)
            zz[i] = signed_ ? zz64((int64_t)wu[i]) : wu[i];
        int all_equal = 1;
        for (long i = 1; i < n; i++)
            if (wu[i] != wu[0]) {
                all_equal = 0;
                break;
            }
        if (all_equal && n >= 3 && n <= 10) {
            uint64_t v = zz[0];
            int width = bitlen_u64(v) ? (bitlen_u64(v) + 7) / 8 : 1;
            out[o++] = (uint8_t)((0 << 6) | ((width - 1) << 3)
                                 | (int)(n - 3));
            o = put_be(out, o, v, width);
            continue;
        }
        if (all_equal && n > 10) {
            /* fixed delta 0 */
            uint64_t base_u = signed_ ? zz64((int64_t)wu[0]) : wu[0];
            long header = (3 << 14) | (0 << 9) | (n - 1);
            o = put_be(out, o, (uint64_t)header, 2);
            o = put_varint(out, o, base_u);
            o = put_varint(out, o, 0);
            continue;
        }
        /* direct */
        int maxb = 0;
        for (long i = 0; i < n; i++) {
            int b = bitlen_u64(zz[i]);
            if (b > maxb)
                maxb = b;
        }
        int dwidth = wclosest(maxb);
        long dcost = 2 + (n * (long)dwidth + 7) / 8;

        DeltaPlan dp;
        plan_delta(wu, n, signed_, &dp);
        PatchPlan pp;
        plan_patched(wu, n, signed_, reduced, &pp);

        /* tie order: direct < delta < patched */
        long best = dcost;
        int choice = 0;
        if (dp.ok && dp.cost < best) {
            best = dp.cost;
            choice = 1;
        }
        if (pp.ok && pp.cost < best) {
            best = pp.cost;
            choice = 2;
        }
        if (choice == 1) {
            int wc = dp.width == 0 ? 0 : wcode(dp.width);
            long header = (3 << 14) | (wc << 9) | (n - 1);
            o = put_be(out, o, (uint64_t)header, 2);
            o = put_varint(out, o, dp.base_u);
            o = put_varint(out, o, zz64(dp.d0));
            if (!dp.fixed && n > 2) {
                orc_pack_width(dp.mags + 1, n - 2, dp.width, out + o);
                o += ((n - 2) * (long)dp.width + 7) / 8;
            }
        } else if (choice == 2) {
            long h = ((long)2 << 30) | ((long)wcode(pp.width) << 25)
                | ((n - 1) << 16) | ((long)(pp.base_width - 1) << 13)
                | ((long)wcode(pp.pw) << 8) | ((long)(pp.pgw - 1) << 5)
                | pp.pll;
            o = put_be(out, o, (uint64_t)h, 4);
            uint64_t mag = pp.base < 0 ? (uint64_t)(-pp.base)
                                       : (uint64_t)pp.base;
            uint64_t raw = mag
                | (pp.base < 0
                   ? (1ULL << (8 * pp.base_width - 1)) : 0);
            o = put_be(out, o, raw, pp.base_width);
            uint64_t mask = pp.width == 64
                ? ~0ULL : ((1ULL << pp.width) - 1);
            for (long i = 0; i < n; i++)
                tmp[i] = reduced[i] & mask;
            orc_pack_width(tmp, n, pp.width, out + o);
            o += (n * (long)pp.width + 7) / 8;
            int ew = wclosest(pp.pw + pp.pgw);
            orc_pack_width(pp.entries, pp.pll, ew, out + o);
            o += (pp.pll * (long)ew + 7) / 8;
        } else {
            long header = (1 << 14) | ((long)wcode(dwidth) << 9)
                | (n - 1);
            o = put_be(out, o, (uint64_t)header, 2);
            orc_pack_width(zz, n, dwidth, out + o);
            o += (n * (long)dwidth + 7) / 8;
        }
    }
    return o;
}
