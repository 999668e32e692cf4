/* Native SAO (band + edge offsets) over one rectangular entry.
 *
 * Behavior parity with this repo's oracle-validated numpy reference
 * rcn/ref_sao.py (apply_sao_entry): SAO reads the deblocked (pre-SAO)
 * samples and writes filtered output; edge filtering skips entry-border
 * rows/columns per EO class, with the single-CTU-row split quirk.
 * Reference-decoder anchors: /root/reference/libovvc/rcn_sao.c
 * (sao_band_filter :46, sao_edge_filter :79, rcn_sao_ctu :119).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static inline int iclamp__(int v, int lo, int hi)
{
    return v < lo ? lo : (v > hi ? hi : v);
}
static inline int imin__(int a, int b) { return a < b ? a : b; }
static inline int imax__(int a, int b) { return a > b ? a : b; }
static inline int sgn__(int v) { return (v > 0) - (v < 0); }

/* per-CTU SAO record layout (native/__init__.py sao_apply_native):
 * [cx, cy, type[3], val[3][5], band_pos[3], eo_class[3]] = 26 int32 */
enum { SR_CX, SR_CY, SR_TYPE, SR_VAL = 5, SR_BPOS = 20, SR_EO = 23,
       SR_NFIELDS = 26 };

typedef struct {
    int32_t pic_w, pic_h, bitdepth, chroma_enabled, ctb_log2;
    int32_t ex0, ey0, nw, nh; /* entry bounds in CTUs */
} SaoEntryParams;

static void sao_band(int32_t *dst, const int32_t *src, int stride, int y0,
                     int x0, int h, int w, const int32_t *offsets,
                     int band_pos, int bitdepth)
{
    /* only 4 consecutive bands (mod 32) carry offsets: select by distance
     * from band_pos instead of a table gather so the loop vectorizes */
    int shift = bitdepth - 5;
    int bd_max = (1 << bitdepth) - 1;
    int o0 = offsets[0], o1 = offsets[1], o2 = offsets[2], o3 = offsets[3];
    for (int j = 0; j < h; j++) {
        const int32_t *restrict s = src + (y0 + j) * stride + x0;
        int32_t *restrict d = dst + (y0 + j) * stride + x0;
        for (int i = 0; i < w; i++) {
            int v = s[i];
            int t = ((v >> shift) - band_pos) & 31;
            int off = o0 * (t == 0) + o1 * (t == 1) + o2 * (t == 2)
                      + o3 * (t == 3);
            d[i] = iclamp__(v + off, 0, bd_max);
        }
    }
}

/* EO neighbor offsets per class: {a, b} as (dx, dy) pairs */
static const int EO_POS[4][2][2] = {
    {{-1, 0}, {1, 0}}, {{0, -1}, {0, 1}}, {{-1, -1}, {1, 1}},
    {{1, -1}, {-1, 1}},
};

static void sao_edge(int32_t *dst, const int32_t *src, int stride, int y0,
                     int x0, int h, int w, const int32_t *offsets, int eo,
                     int bitdepth, int b_left, int b_top, int b_right,
                     int b_bottom)
{
    if (b_left && eo != 1) { x0++; w--; }
    if (b_top && eo != 0) { y0++; h--; }
    if (b_right && eo != 1) w--;
    if (b_bottom && eo != 0) h--;
    if (w <= 0 || h <= 0)
        return;
    int ax = EO_POS[eo][0][0], ay = EO_POS[eo][0][1];
    int bx = EO_POS[eo][1][0], by = EO_POS[eo][1][1];
    int bd_max = (1 << bitdepth) - 1;
    int o0 = offsets[0], o1 = offsets[1], o2 = offsets[2];
    int o3 = offsets[3], o4 = offsets[4];
    for (int j = 0; j < h; j++) {
        const int32_t *restrict s = src + (y0 + j) * stride + x0;
        const int32_t *restrict na = s + ay * stride + ax;
        const int32_t *restrict nb = s + by * stride + bx;
        int32_t *restrict d = dst + (y0 + j) * stride + x0;
        for (int i = 0; i < w; i++) {
            int v = s[i];
            int da = v - na[i], db = v - nb[i];
            int e = (da > 0) - (da < 0) + (db > 0) - (db < 0);
            int off = o0 * (e == -2) + o1 * (e == -1) + o2 * (e == 0)
                      + o3 * (e == 1) + o4 * (e == 2);
            d[i] = iclamp__(v + off, 0, bd_max);
        }
    }
}

int64_t ov_sao_entry(const SaoEntryParams *sp, const int32_t *recs,
                     int64_t nrec, int32_t *fy, int32_t *fcb, int32_t *fcr)
{
    int np = sp->chroma_enabled ? 3 : 1;
    int32_t *planes[3] = {fy, fcb, fcr};
    /* pre-SAO source: copy only the entry rect + 1-sample halo (edge
     * classification reads at most one neighbor in each direction) */
    int32_t *srcs[3] = {0, 0, 0}; /* virtual full-plane base pointers */
    int32_t *allocs[3] = {0, 0, 0};
    int ctb = 1 << sp->ctb_log2;
    for (int c = 0; c < np; c++) {
        int sh = c == 0 ? 0 : 1;
        int W = sp->pic_w >> sh, H = sp->pic_h >> sh;
        int ex = ((sp->ex0 << sp->ctb_log2) >> sh) - 1;
        int ey = ((sp->ey0 << sp->ctb_log2) >> sh) - 1;
        int ex1 = (((sp->ex0 + sp->nw) << sp->ctb_log2) >> sh) + 1;
        int ey1 = (((sp->ey0 + sp->nh) << sp->ctb_log2) >> sh) + 1;
        ex = imin__(imax__(ex, 0), W); ex1 = imin__(imax__(ex1, 0), W);
        ey = imin__(imax__(ey, 0), H); ey1 = imin__(imax__(ey1, 0), H);
        int rw = ex1 - ex, rh = ey1 - ey;
        /* keep the copy at the PLANE stride so absolute (x, y) indexing
         * stays valid: allocate rh rows of W, fill only [ex, ex1) */
        allocs[c] = malloc((size_t)rh * W * sizeof(int32_t));
        if (!allocs[c]) {
            for (int k = 0; k < c; k++) free(allocs[k]);
            return -2;
        }
        for (int j = 0; j < rh; j++)
            memcpy(allocs[c] + (size_t)j * W + ex,
                   planes[c] + (size_t)(ey + j) * W + ex,
                   (size_t)rw * sizeof(int32_t));
        srcs[c] = allocs[c] - (size_t)ey * W; /* virtual row-0 base */
    }

    for (int64_t r = 0; r < nrec; r++) {
        const int32_t *rec = recs + r * SR_NFIELDS;
        int cx = rec[SR_CX], cy = rec[SR_CY];
        for (int c = 0; c < np; c++) {
            int type = rec[SR_TYPE + c];
            if (type == 0)
                continue;
            int sh = c == 0 ? 0 : 1;
            int stride = sp->pic_w >> sh;
            int x0 = (cx << sp->ctb_log2) >> sh;
            int y0 = (cy << sp->ctb_log2) >> sh;
            int w = imin__(ctb >> sh, (sp->pic_w >> sh) - x0);
            int h = imin__(ctb >> sh, (sp->pic_h >> sh) - y0);
            if (w <= 0 || h <= 0)
                continue;
            const int32_t *val = rec + SR_VAL + c * 5;
            if (type == 1) { /* SAO_BAND */
                sao_band(planes[c], srcs[c], stride, y0, x0, h, w, val,
                         rec[SR_BPOS + c], sp->bitdepth);
            } else {
                int eo = rec[SR_EO + c];
                int b_l = cx == sp->ex0;
                int b_t = cy == sp->ey0;
                int b_r = cx == sp->ex0 + sp->nw - 1
                          || ((cx + 1) << sp->ctb_log2) >= sp->pic_w;
                int b_b = cy == sp->ey0 + sp->nh - 1
                          || ((cy + 1) << sp->ctb_log2) >= sp->pic_h;
                if (sp->nh == 1) {
                    /* single-CTU-row entry quirk (rcn_sao.c pipeline): the
                     * CTU is SAO'd as [0, 2*margin) then [2*margin, H),
                     * each with the BOTTOM border trim -> row 2*margin-1
                     * never filtered */
                    int m = 6 >> sh;
                    sao_edge(planes[c], srcs[c], stride, y0, x0,
                             imin__(m, h), w, val, eo, sp->bitdepth,
                             b_l, b_t, b_r, 1);
                    if (h > m)
                        sao_edge(planes[c], srcs[c], stride, y0 + m, x0,
                                 h - m, w, val, eo, sp->bitdepth,
                                 b_l, 0, b_r, b_b);
                } else {
                    sao_edge(planes[c], srcs[c], stride, y0, x0, h, w, val,
                             eo, sp->bitdepth, b_l, b_t, b_r, b_b);
                }
            }
        }
    }

    for (int c = 0; c < np; c++)
        free(allocs[c]);
    return 0;
}
