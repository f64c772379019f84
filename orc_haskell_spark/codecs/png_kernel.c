/* PNG scanline unfilter in C (spec 9.2): the serial byte recurrence
 * (Sub/Average/Paeth depend on the previous reconstructed byte) makes
 * Python-side loops seconds-per-photo; here it is one pass.
 *
 * rows: height * (stride + 1) filtered bytes (leading filter byte per
 * row); out: height * stride reconstructed bytes. bpp = bytes per
 * pixel. Returns 0, or -1 on an unknown filter type.
 */

#include <stdint.h>
#include <stdlib.h>

long png_unfilter(const uint8_t *rows, long height, long stride,
                  long bpp, uint8_t *out) {
    for (long y = 0; y < height; y++) {
        const uint8_t *cur = rows + y * (stride + 1);
        uint8_t f = cur[0];
        cur++;
        uint8_t *rec = out + y * stride;
        const uint8_t *prev = y ? out + (y - 1) * stride : 0;
        switch (f) {
        case 0:
            for (long x = 0; x < stride; x++)
                rec[x] = cur[x];
            break;
        case 1:
            for (long x = 0; x < stride; x++) {
                uint8_t a = x >= bpp ? rec[x - bpp] : 0;
                rec[x] = (uint8_t)(cur[x] + a);
            }
            break;
        case 2:
            for (long x = 0; x < stride; x++)
                rec[x] = (uint8_t)(cur[x] + (prev ? prev[x] : 0));
            break;
        case 3:
            for (long x = 0; x < stride; x++) {
                int a = x >= bpp ? rec[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                rec[x] = (uint8_t)(cur[x] + ((a + b) >> 1));
            }
            break;
        case 4:
            for (long x = 0; x < stride; x++) {
                int a = x >= bpp ? rec[x - bpp] : 0;
                int b = prev ? prev[x] : 0;
                int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
                int p = a + b - c;
                int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
                int pred = (pa <= pb && pa <= pc) ? a
                    : (pb <= pc ? b : c);
                rec[x] = (uint8_t)(cur[x] + pred);
            }
            break;
        default:
            return -1;
        }
    }
    return 0;
}
