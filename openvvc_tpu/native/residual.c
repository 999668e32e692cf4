/* Native regular residual_coding reader (transform coefficients).
 *
 * Direct C port of openvvc_tpu/vcl/residual.py's reader path (ITU-T H.266
 * 7.3.11.11 residual_coding): last-significant position (both context
 * prefixes, then both bypass suffixes), reverse diagonal subblock scan,
 * dep-quant trellis states / sign-data-hiding, 1.75N context-bin budget with
 * rice bypass fallback. Operates on the CabacDec from cabac.c.
 *
 * Built together with cabac.c into libcabac.so (see __init__.py).
 */

#include <stdint.h>
#include <string.h>

#define OV_CABAC_ALIASES
#include "cabac_inl.h"

/* context offsets (openvvc_tpu/cabac/ctx.py CtxOffset) */
#define CTX_LAST_X 246
#define CTX_LAST_Y 269
#define CTX_LAST_X_C 266
#define CTX_LAST_Y_C 289
#define CTX_SIG 90
#define CTX_SIG_C 126
#define CTX_GT0 214
#define CTX_GT0_C 235
#define CTX_PAR 150
#define CTX_PAR_C 171
#define CTX_GT1 182
#define CTX_GT1_C 203
#define CTX_SIG_GRP 86
#define CTX_SIG_GRP_C 88

static const uint8_t last_prefix_ctx[8] = { 0, 0, 0, 3, 6, 10, 15, 21 };
static const uint8_t rice_tab[32] = {
    0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3
};
static const uint8_t dq_next[4][2] = { { 0, 2 }, { 2, 0 }, { 1, 3 }, { 3, 1 } };

#define MAXW 64
#define PAD 2
#define NBW (32 + PAD + 2)
#define NBH (32 + PAD)

struct TB {
    int32_t abs1[NBH][NBW];
    int32_t abs2[NBH][NBW];
    int32_t sig[NBH][NBW];
    uint8_t scan_x[64];   /* in-subblock diagonal scan */
    uint8_t scan_y[64];
    int sig_x[64];        /* per-subblock significant list */
    int sig_y[64];
    int sig_p[64];        /* scan index of each significant entry */
    int abs_lvl[64];
    int dep_map[64];
    int gt2_x[64];
    int gt2_y[64];
    int gt2_i[64];        /* index into the sig list for pass-2 bumps */
    int luma, dep_quant, sdh;
    int rem_bins, state;
    int sig_base, gt1_base, par_base, gt2_base;
    int state_off[4];
};

static void diag_scan(int w, int h, uint8_t *sx, uint8_t *sy)
{
    int n = 0;
    for (int d = 0; d < w + h - 1; d++) {
        int ymax = d < h - 1 ? d : h - 1;
        for (int y = ymax; y >= 0; y--) {
            int x = d - y;
            if (x < w) {
                sx[n] = (uint8_t)x;
                sy[n] = (uint8_t)y;
                n++;
            }
        }
    }
}

static inline int sig_offset(int d, int luma)
{
    if (luma)
        return d < 2 ? 8 : (d < 5 ? 4 : 0);
    return d < 2 ? 4 : 0;
}

static inline int gt_offset(int d, int luma)
{
    if (luma)
        return d == 0 ? 15 : (d < 3 ? 10 : (d < 10 ? 5 : 0));
    return d == 0 ? 5 : 0;
}

static inline void nbr_update_pass1(struct TB *tb, int x, int y, int v)
{
    int yy = y + PAD, xx = x + PAD;
    tb->abs1[yy][xx - 1] += v;
    tb->abs1[yy][xx - 2] += v;
    tb->abs1[yy - 1][xx] += v;
    tb->abs1[yy - 1][xx - 1] += v;
    tb->abs1[yy - 2][xx] += v;
    tb->abs2[yy][xx - 1] += v;
    tb->abs2[yy][xx - 2] += v;
    tb->abs2[yy - 1][xx] += v;
    tb->abs2[yy - 1][xx - 1] += v;
    tb->abs2[yy - 2][xx] += v;
    tb->sig[yy][xx - 1] += v - 1;
    tb->sig[yy][xx - 2] += v - 1;
    tb->sig[yy - 1][xx] += v - 1;
    tb->sig[yy - 1][xx - 1] += v - 1;
    tb->sig[yy - 2][xx] += v - 1;
}

static inline void nbr_update_pass2(struct TB *tb, int x, int y, int v)
{
    static const int8_t off[5][2] = { {0,-1}, {0,-2}, {-1,0}, {-1,-1}, {-2,0} };
    for (int k = 0; k < 5; k++) {
        int yy = y + PAD + off[k][0], xx = x + PAD + off[k][1];
        int nv = tb->abs2[yy][xx] + v;
        tb->abs2[yy][xx] = nv > 51 ? 51 : nv;
    }
}

static int decode_rice(CabacDec *d, int rice)
{
    int prefix = 0;
    while (prefix < 17 && cabac_decode_bypass(d))
        prefix++;
    if (prefix < 5)
        return (prefix << rice) + (rice ? (int)cabac_decode_bypass_bits(d, rice) : 0);
    int length = rice + (prefix == 17 ? 15 - rice : prefix - 5);
    int offset = ((1 << (prefix - 5)) + 4) << rice;
    return offset + (length ? (int)cabac_decode_bypass_bits(d, length) : 0);
}

static int last_prefix(CabacDec *d, int log2_d, int log2_red, int base, int luma)
{
    int ctx_off, ctx_shift;
    if (luma) {
        ctx_off = last_prefix_ctx[log2_d];
        ctx_shift = (log2_red + 1) >> 2;
    } else {
        ctx_off = 0;
        ctx_shift = (1 << log2_d) >> 3;
        if (ctx_shift > 2) ctx_shift = 2;
    }
    int max_sym = (log2_red < 5 ? log2_red : 5) << 1;
    int pos = 0;
    while (max_sym - 1 > pos && cabac_decode_bin(d, base + ctx_off + (pos >> ctx_shift)))
        pos++;
    return pos;
}

static int last_suffix(CabacDec *d, int prefix)
{
    int nbits = (prefix - 2) >> 1;
    int lo = (1 << ((prefix >> 1) - 1)) * (2 + (prefix & 1));
    return lo + (nbits ? (int)cabac_decode_bypass_bits(d, nbits) : 0);
}

/* codes one subblock; returns nb_sig */
static int code_subblock(CabacDec *d, struct TB *tb, int32_t *levels,
                         int32_t *decoded, int stride, int sb_x, int sb_y,
                         int log2_sb_w, int log2_sb_h, int start_pos,
                         int is_first_sb, int is_dc_sb)
{
    int x0 = sb_x << log2_sb_w, y0 = sb_y << log2_sb_h;
    int nb_sig = 0, nb_gt2 = 0;
    int scan_pos = start_pos;

    if (is_first_sb) {
        int lx = tb->scan_x[scan_pos], ly = tb->scan_y[scan_pos];
        int gt1 = cabac_decode_bin(d, tb->gt1_base);
        tb->rem_bins -= 1;
        int coeff = 1 + gt1;
        if (gt1) {
            int par = cabac_decode_bin(d, tb->par_base);
            int gt2 = cabac_decode_bin(d, tb->gt2_base);
            tb->rem_bins -= 2;
            coeff += par + 2 * gt2;
            if (gt2) {
                tb->gt2_x[nb_gt2] = lx; tb->gt2_y[nb_gt2] = ly;
                tb->gt2_i[nb_gt2] = nb_sig; nb_gt2++;
            }
        }
        tb->dep_map[nb_sig] = tb->state >> 1;
        tb->sig_x[nb_sig] = lx; tb->sig_y[nb_sig] = ly;
        tb->sig_p[nb_sig] = scan_pos;
        tb->abs_lvl[nb_sig] = coeff;
        nb_sig++;
        nbr_update_pass1(tb, x0 + lx, y0 + ly, coeff);
        tb->state = tb->dep_quant ? dq_next[tb->state][coeff & 1] : 0;
        scan_pos--;
    }

    while (scan_pos >= 0 && tb->rem_bins >= 4) {
        int lx = tb->scan_x[scan_pos], ly = tb->scan_y[scan_pos];
        int gx = x0 + lx, gy = y0 + ly;
        int dd = gx + gy;
        int a1 = tb->abs1[gy + PAD][gx + PAD];
        int sg = tb->sig[gy + PAD][gx + PAD];
        int sig;
        if (scan_pos == 0 && !is_dc_sb && !is_first_sb && nb_sig == 0) {
            sig = 1;
        } else {
            int t = (a1 + 1) >> 1;
            if (t > 3) t = 3;
            int ctx = tb->sig_base + tb->state_off[tb->state] + t + sig_offset(dd, tb->luma);
            sig = cabac_decode_bin(d, ctx);
            tb->rem_bins -= 1;
        }
        int coeff = 0;
        if (sig) {
            int s = sg > 4 ? 4 : sg;
            int gt_ctx_off = 1 + s + gt_offset(dd, tb->luma);
            int gt1 = cabac_decode_bin(d, tb->gt1_base + gt_ctx_off);
            tb->rem_bins -= 1;
            coeff = 1 + gt1;
            if (gt1) {
                int par = cabac_decode_bin(d, tb->par_base + gt_ctx_off);
                int gt2 = cabac_decode_bin(d, tb->gt2_base + gt_ctx_off);
                tb->rem_bins -= 2;
                coeff += par + 2 * gt2;
                if (gt2) {
                    tb->gt2_x[nb_gt2] = lx; tb->gt2_y[nb_gt2] = ly;
                    tb->gt2_i[nb_gt2] = nb_sig; nb_gt2++;
                }
            }
            tb->dep_map[nb_sig] = tb->state >> 1;
            tb->sig_x[nb_sig] = lx; tb->sig_y[nb_sig] = ly;
            tb->sig_p[nb_sig] = scan_pos;
            tb->abs_lvl[nb_sig] = coeff;
            nb_sig++;
            nbr_update_pass1(tb, gx, gy, coeff);
        }
        tb->state = tb->dep_quant ? dq_next[tb->state][coeff & 1] : 0;
        scan_pos--;
    }

    /* pass 2: rice remainders */
    for (int k = 0; k < nb_gt2; k++) {
        int lx = tb->gt2_x[k], ly = tb->gt2_y[k];
        int gx = x0 + lx, gy = y0 + ly;
        int a2 = tb->abs2[gy + PAD][gx + PAD];
        int t = a2 - 20;
        if (t < 0) t = 0;
        if (t > 31) t = 31;
        int rice = rice_tab[t];
        int rem = decode_rice(d, rice);
        if (rem) {
            nbr_update_pass2(tb, gx, gy, 2 * rem);
            tb->abs_lvl[tb->gt2_i[k]] += 2 * rem;
        }
    }

    /* bypass tail */
    while (scan_pos >= 0) {
        int lx = tb->scan_x[scan_pos], ly = tb->scan_y[scan_pos];
        int gx = x0 + lx, gy = y0 + ly;
        int a2 = tb->abs2[gy + PAD][gx + PAD];
        int rice = rice_tab[a2 > 31 ? 31 : a2];
        int zero_pos = ((tb->dep_quant ? (tb->state < 2 ? 1 : 2) : 1)) << rice;
        int v = decode_rice(d, rice);
        int value;
        if (v == zero_pos) value = 0;
        else if (v < zero_pos) value = v + 1;
        else value = v;
        if (value) {
            nbr_update_pass2(tb, gx, gy, value);
            tb->dep_map[nb_sig] = tb->state >> 1;
            tb->sig_x[nb_sig] = lx; tb->sig_y[nb_sig] = ly;
            tb->sig_p[nb_sig] = scan_pos;
            tb->abs_lvl[nb_sig] = value;
            nb_sig++;
        }
        tb->state = tb->dep_quant ? dq_next[tb->state][value & 1] : 0;
        scan_pos--;
    }

    /* signs */
    if (tb->dep_quant) {
        for (int k = 0; k < nb_sig; k++) {
            int s = cabac_decode_bypass(d);
            int lx = tb->sig_x[k], ly = tb->sig_y[k];
            int a = tb->abs_lvl[k];
            levels[(y0 + ly) * stride + x0 + lx] = s ? -a : a;
            int fin = (a << 1) - tb->dep_map[k];
            decoded[(y0 + ly) * stride + x0 + lx] = s ? -fin : fin;
        }
    } else {
        int use_sdh = 0;
        if (tb->sdh && nb_sig) {
            /* entries are pushed in descending scan order: first pushed
             * has the highest scan index, last pushed the lowest */
            use_sdh = (tb->sig_p[0] - tb->sig_p[nb_sig - 1]) >= 4;
        }
        int sum_par = 0;
        int n_signs = nb_sig - use_sdh;
        int signs[64];
        for (int k = 0; k < n_signs; k++)
            signs[k] = cabac_decode_bypass(d);
        for (int k = 0; k < nb_sig; k++) {
            int a = tb->abs_lvl[k];
            sum_par ^= a;
            int s = k < n_signs ? signs[k] : (sum_par & 1);
            int lx = tb->sig_x[k], ly = tb->sig_y[k];
            levels[(y0 + ly) * stride + x0 + lx] = s ? -a : a;
            decoded[(y0 + ly) * stride + x0 + lx] = s ? -a : a;
        }
    }
    return nb_sig;
}

/* Full TB decode. levels/decoded are caller-provided [h][w] int32 arrays
 * (zeroed by this function). Returns packed (last_y << 8 | last_x), writes
 * sig_sb_map. */
int64_t rc_decode_tb(CabacDec *d, int32_t *levels, int32_t *decoded,
                     int log2_w, int log2_h, int luma, int dep_quant, int sdh,
                     int mts_reduced, uint64_t *sig_sb_map_out)
{
    int w = 1 << log2_w, h = 1 << log2_h;
    memset(levels, 0, sizeof(int32_t) * w * h);
    memset(decoded, 0, sizeof(int32_t) * w * h);

    int red_w = log2_w < 5 ? log2_w : 5;
    int red_h = log2_h < 5 ? log2_h : 5;
    int lim_w = red_w - (mts_reduced && log2_w == 5 ? 1 : 0);
    int lim_h = red_h - (mts_reduced && log2_h == 5 ? 1 : 0);

    int bx = luma ? CTX_LAST_X : CTX_LAST_X_C;
    int by = luma ? CTX_LAST_Y : CTX_LAST_Y_C;
    int px = last_prefix(d, log2_w, lim_w, bx, luma);
    int py = last_prefix(d, log2_h, lim_h, by, luma);
    int last_x = px > 3 ? last_suffix(d, px) : px;
    int last_y = py > 3 ? last_suffix(d, py) : py;

    struct TB tb; /* stack-allocated: entry threads parse concurrently */
    tb.luma = luma;
    tb.dep_quant = dep_quant;
    tb.sdh = sdh;
    {
        int size = 1 << (lim_w + lim_h);
        tb.rem_bins = ((size << 5) - (size << 2)) >> 4;
    }
    tb.state = 0;
    if (luma) {
        tb.sig_base = CTX_SIG; tb.gt1_base = CTX_GT0;
        tb.par_base = CTX_PAR; tb.gt2_base = CTX_GT1;
        tb.state_off[0] = 0; tb.state_off[1] = 0;
        tb.state_off[2] = 12; tb.state_off[3] = 24;
    } else {
        tb.sig_base = CTX_SIG_C; tb.gt1_base = CTX_GT0_C;
        tb.par_base = CTX_PAR_C; tb.gt2_base = CTX_GT1_C;
        tb.state_off[0] = 0; tb.state_off[1] = 0;
        tb.state_off[2] = 8; tb.state_off[3] = 16;
    }

    if (last_x == 0 && last_y == 0) {
        int gt1 = cabac_decode_bin(d, tb.gt1_base);
        int value = 1 + gt1;
        if (gt1) {
            int par = cabac_decode_bin(d, tb.par_base);
            int gt2 = cabac_decode_bin(d, tb.gt2_base);
            value += par + 2 * gt2;
            if (gt2)
                value += decode_rice(d, 0) * 2;
        }
        int s = cabac_decode_bypass(d);
        levels[0] = s ? -value : value;
        int a = dep_quant ? value << 1 : value;
        decoded[0] = s ? -a : a;
        *sig_sb_map_out = 1;
        return 0;
    }

    /* clear only the region the neighbour templates touch:
     * rows 0..(1<<lim_h)+PAD-1, cols 0..(1<<lim_w)+PAD-1 */
    {
        int clr_h = (1 << lim_h) + PAD, clr_w = (1 << lim_w) + PAD;
        size_t row = (size_t)clr_w * sizeof(int32_t);
        for (int r = 0; r < clr_h; r++) {
            memset(tb.abs1[r], 0, row);
            memset(tb.abs2[r], 0, row);
            memset(tb.sig[r], 0, row);
        }
    }

    /* subblock geometry (sb_dims) */
    int lsw, lsh;
    if ((lim_w < lim_h ? lim_w : lim_h) >= 2) {
        lsw = 2; lsh = 2;
    } else if (lim_w + lim_h <= 3) {
        lsw = lim_w < 1 ? lim_w : 1;
        lsh = lim_h < 1 ? lim_h : 1;
    } else if (lim_w < 2) {
        lsw = lim_w; lsh = 4 - lim_w;
    } else {
        lsw = 4 - lim_h; lsh = lim_h;
    }
    int sb_cols = 1 << (lim_w - lsw > 0 ? lim_w - lsw : 0);
    int sb_rows = 1 << (lim_h - lsh > 0 ? lim_h - lsh : 0);

    uint8_t sb_sx[256], sb_sy[256];
    diag_scan(sb_cols, sb_rows, sb_sx, sb_sy);
    diag_scan(1 << lsw, 1 << lsh, tb.scan_x, tb.scan_y);

    int last_sb_x = last_x >> lsw, last_sb_y = last_y >> lsh;
    int last_sb_num = -1, nb_sb = sb_cols * sb_rows;
    for (int i = 0; i < nb_sb; i++)
        if (sb_sx[i] == last_sb_x && sb_sy[i] == last_sb_y) { last_sb_num = i; break; }
    int start_idx = -1;
    {
        int llx = last_x & ((1 << lsw) - 1), lly = last_y & ((1 << lsh) - 1);
        int n = 1 << (lsw + lsh);
        for (int i = 0; i < n; i++)
            if (tb.scan_x[i] == llx && tb.scan_y[i] == lly) { start_idx = i; break; }
    }

    uint64_t sig_sb_map = 1ull << (last_sb_x + (last_sb_y << 3));
    uint8_t sig_sb[8][8];
    memset(sig_sb, 0, sizeof(sig_sb));
    sig_sb[last_sb_y][last_sb_x] = 1;

    int is_dc = last_sb_num == 0;
    code_subblock(d, &tb, levels, decoded, w, last_sb_x, last_sb_y, lsw, lsh,
                  start_idx, 1, is_dc);
    if (is_dc) {
        *sig_sb_map_out = sig_sb_map | 1;
        return ((int64_t)last_y << 8) | last_x;
    }

    int grp_base = luma ? CTX_SIG_GRP : CTX_SIG_GRP_C;
    int sb_size_m1 = (1 << (lsw + lsh)) - 1;
    for (int sb_num = last_sb_num - 1; sb_num > 0; sb_num--) {
        int sx = sb_sx[sb_num], sy = sb_sy[sb_num];
        int ngh = 0;
        if (sx + 1 < sb_cols && sig_sb[sy][sx + 1]) ngh = 1;
        if (sy + 1 < sb_rows && sig_sb[sy + 1][sx]) ngh = 1;
        int flag = cabac_decode_bin(d, grp_base + ngh);
        if (flag) {
            sig_sb[sy][sx] = 1;
            sig_sb_map |= 1ull << (sx + (sy << 3));
            code_subblock(d, &tb, levels, decoded, w, sx, sy, lsw, lsh,
                          sb_size_m1, 0, 0);
        }
    }
    /* DC subblock */
    code_subblock(d, &tb, levels, decoded, w, 0, 0, lsw, lsh, sb_size_m1, 0, 1);
    *sig_sb_map_out = sig_sb_map | 1;
    return ((int64_t)last_y << 8) | last_x;
}
