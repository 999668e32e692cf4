/* Quadtree coarsening of the per-4x4-unit motion grid into uniform
 * square MC jobs for the Pallas dense MC kernel.
 *
 * C drop-in for tpu/mc_pallas_dense.extract_jobs (same merging rule:
 * blocks merge iff ALL 20 derived window/fraction/weight fields match,
 * so the emitted jobs are field-identical to the numpy path).  The
 * numpy quadtree costs ~38 ms per 1080p frame on this host; this runs
 * in ~2 ms.  Reference anchor for the motion-field layout: OpenVVC
 * per-PU MC dispatch rcn_mc.c:448-720 (here re-expressed as a dense
 * grid, SURVEY.md section 7.1).
 */

#include <stdint.h>
#include <string.h>
#include <stdlib.h>

#define NKEY 20
#define NJOB 22

typedef struct {
    int32_t f[NKEY];
} UKey;

/* key field order mirrors mc_pallas_dense.extract_jobs key_fields:
 * sl0 yb0 xb0 fx0 fy0 sl1 yb1 xb1 fx1 fy1
 * cyb0 cxb0 cfx0 cfy0 cyb1 cxb1 cfx1 cfy1 w0 w1
 * (yb/xb/cyb/cxb are MV-relative here; absolute at emit time) */

static const int CLASSES[5] = {16, 8, 4, 2, 1};

int ov_mc_jobs(const uint8_t *gmask, const int32_t *gmv, const int8_t *gref,
               const int8_t *gw, const uint8_t *ghpel,
               const int32_t *lut0, const int32_t *lut1,
               int uw, int uh, int uhp, int uwp, int pad_l, int pad_c,
               int8_t *cmap, int32_t *jobs, int32_t *counts)
{
    int n_units = uhp * uwp;
    UKey *keys = (UKey *)malloc((size_t)n_units * sizeof(UKey));
    /* uniform flags per level, unit-granular addressing by block index */
    uint8_t *uni[5];
    int li;
    if (!keys)
        return -1;
    for (li = 0; li < 5; li++) {
        uni[li] = (uint8_t *)calloc((size_t)(uhp / CLASSES[4 - li]) *
                                    (uwp / CLASSES[4 - li]), 1);
        if (!uni[li]) {
            while (li--)
                free(uni[li]);
            free(keys);
            return -1;
        }
    }
    /* uni[0] = level 1 (valid), uni[1] = level 2, ... uni[4] = level 16 */

    for (int uy = 0; uy < uhp; uy++) {
        for (int ux = 0; ux < uwp; ux++) {
            int bi = uy * uwp + ux;
            if (uy >= uh || ux >= uw || !gmask[uy * uw + ux]) {
                uni[0][bi] = 0;
                memset(&keys[bi], 0, sizeof(UKey));
                continue;
            }
            uni[0][bi] = 1;
            int u = uy * uw + ux;
            const int32_t *mv = gmv + 4 * u;
            int hp = ghpel[u];
            int32_t *f = keys[bi].f;
            for (int l = 0; l < 2; l++) {
                int mvx = mv[2 * l], mvy = mv[2 * l + 1];
                int ref = gref[2 * u + l];
                if (ref < 0)
                    ref = 0;
                if (ref > 15)
                    ref = 15;
                int sl = l ? lut1[ref] : lut0[ref];
                int fx = mvx & 15, fy = mvy & 15;
                if (hp && fx == 8)
                    fx = 16;
                if (hp && fy == 8)
                    fy = 16;
                f[5 * l + 0] = sl;
                f[5 * l + 1] = (mvy >> 4) - 3 + pad_l;
                f[5 * l + 2] = (mvx >> 4) - 3 + pad_l;
                f[5 * l + 3] = fx;
                f[5 * l + 4] = fy;
                f[10 + 4 * l + 0] = (mvy >> 5) - 1 + pad_c;
                f[10 + 4 * l + 1] = (mvx >> 5) - 1 + pad_c;
                f[10 + 4 * l + 2] = mvx & 31;
                f[10 + 4 * l + 3] = mvy & 31;
            }
            f[18] = gw[2 * u + 0];
            f[19] = gw[2 * u + 1];
        }
    }

    /* hierarchical uniformity: block (by,bx) at level L is uniform iff
     * its four level-L/2 children are uniform and the keys at the four
     * children's top-left units match */
    for (li = 1; li < 5; li++) {
        int L = CLASSES[4 - li], Lh = L >> 1;
        int h2 = uhp / L, w2 = uwp / L;
        int wc = uwp / Lh;
        for (int by = 0; by < h2; by++) {
            for (int bx = 0; bx < w2; bx++) {
                const uint8_t *c = uni[li - 1];
                int cy = 2 * by, cx = 2 * bx;
                if (!(c[cy * wc + cx] & c[cy * wc + cx + 1] &
                      c[(cy + 1) * wc + cx] & c[(cy + 1) * wc + cx + 1]))
                    continue;
                const UKey *k0 = &keys[(L * by) * uwp + L * bx];
                const UKey *k1 = &keys[(L * by) * uwp + L * bx + Lh];
                const UKey *k2 = &keys[(L * by + Lh) * uwp + L * bx];
                const UKey *k3 = &keys[(L * by + Lh) * uwp + L * bx + Lh];
                if (!memcmp(k0, k1, sizeof(UKey)) &&
                    !memcmp(k0, k2, sizeof(UKey)) &&
                    !memcmp(k0, k3, sizeof(UKey)))
                    uni[li][by * w2 + bx] = 1;
            }
        }
    }

    memset(cmap, -1, (size_t)n_units);

    /* top-down emit, biggest classes first; a block is taken when any
     * ancestor emitted (cmap at its top-left unit is set) */
    int32_t *out = jobs;
    for (int ci = 0; ci < 5; ci++) {
        int L = CLASSES[ci];
        int h2 = uhp / L, w2 = uwp / L;
        const uint8_t *u8 = uni[4 - ci];
        int n = 0;
        for (int by = 0; by < h2; by++) {
            for (int bx = 0; bx < w2; bx++) {
                if (!u8[by * w2 + bx])
                    continue;
                int ty = L * by, tx = L * bx;
                if (cmap[ty * uwp + tx] != -1)
                    continue;
                for (int y = ty; y < ty + L; y++)
                    memset(cmap + y * uwp + tx, (char)L, (size_t)L);
                const int32_t *f = keys[ty * uwp + tx].f;
                /* job field order mirrors build_mc_bundle:
                 * cy cx sl0 yb0 xb0 sl1 yb1 xb1 w0 w1 fx0 fy0 fx1 fy1
                 * cyb0 cxb0 cfx0 cfy0 cyb1 cxb1 cfx1 cfy1 */
                out[0] = by;
                out[1] = bx;
                out[2] = f[0];
                out[3] = f[1] + 4 * ty;
                out[4] = f[2] + 4 * tx;
                out[5] = f[5];
                out[6] = f[6] + 4 * ty;
                out[7] = f[7] + 4 * tx;
                out[8] = f[18];
                out[9] = f[19];
                out[10] = f[3];
                out[11] = f[4];
                out[12] = f[8];
                out[13] = f[9];
                out[14] = f[10] + 2 * ty;
                out[15] = f[11] + 2 * tx;
                out[16] = f[12];
                out[17] = f[13];
                out[18] = f[14] + 2 * ty;
                out[19] = f[15] + 2 * tx;
                out[20] = f[16];
                out[21] = f[17];
                out += NJOB;
                n++;
            }
        }
        counts[ci] = n;
    }

    for (li = 0; li < 5; li++)
        free(uni[li]);
    free(keys);
    return 0;
}
