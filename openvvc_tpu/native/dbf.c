/* Native whole-frame VVC deblocking filter (luma + chroma).
 *
 * Behavior parity is with this repo's oracle-validated numpy reference
 * rcn/ref_dbf.py (deblock_plane_luma, deblock_chroma, finalize_inter_bs):
 * edge derivation on the 4x4 luma-unit grid, bs2 intra / bs1 coded-TB /
 * MV-based bs1, beta/tc limits, luma long (7/5/3) + strong + weak filters,
 * affine/SbTMVP sub-block edge rules, chroma strong/weak with CTU-top
 * line restriction. Reference-decoder anchors:
 * /root/reference/libovvc/rcn_df.c (compute_dbf_limits :172, long filters
 * :217-900, filter_luma_weak :901, chroma :1146-1430, MV bs preproc
 * :1527-1875). The reference's per-CTU staging is replaced by the spec's
 * whole-frame two-pass order (all vertical edges, then all horizontal).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "ov_shared.h"

static inline int imin_(int a, int b) { return a < b ? a : b; }
static inline int imax_(int a, int b) { return a > b ? a : b; }
static inline int iclamp_(int v, int lo, int hi)
{
    return v < lo ? lo : (v > hi ? hi : v);
}

static const int16_t TC_LUT[67] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    3, 4, 4, 4, 4, 5, 5, 5, 5, 7, 7, 8, 9, 10, 10, 11,
    13, 14, 15, 17, 19, 21, 24, 25, 29, 33, 36, 41, 45, 51, 57, 64,
    71, 80, 89, 100, 112, 125, 141, 157, 177, 198, 222, 250, 280, 314,
    352, 395,
    395, /* idx 66 guard (qp+2*(bs-1)+off clipped to 66 in ref LUT of 66) */
};

static const int16_t BETA_LUT[65] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86, 88,
};

static void limits(int qp, int bs, int beta_off, int tc_off, int bitdepth,
                   int *beta, int *tc)
{
    int tc_idx = iclamp_(qp + 2 * (bs - 1) + tc_off, 0, 66);
    int beta_idx = iclamp_(qp + beta_off, 0, 64);
    if (bitdepth >= 10)
        *tc = TC_LUT[tc_idx] << (bitdepth - 10);
    else
        *tc = (TC_LUT[tc_idx] + (1 << (9 - bitdepth))) >> (10 - bitdepth);
    *beta = BETA_LUT[beta_idx] << (bitdepth - 8);
}

/* long filter weights / tc weights per side length (ref_dbf.py _DB_W/_TC_W) */
static const int DB_W7[7] = {59, 50, 41, 32, 23, 14, 5};
static const int DB_W5[5] = {58, 45, 32, 19, 6};
static const int DB_W3[3] = {53, 32, 11};
static const int TC_W7[7] = {6, 5, 4, 3, 2, 1, 1};
static const int TC_W5[5] = {6, 5, 4, 3, 2};
static const int TC_W3[3] = {6, 4, 2};

/* One line perpendicular to the edge: base points at the q0 sample,
 * step is +1 (vertical edge, horizontal line) or +stride. p(k) =
 * base[-(k+1)*step], q(k) = base[k*step]. */
typedef struct { int32_t *base; int step; } Ln;

static inline int P(const Ln *l, int k) { return l->base[-(k + 1) * l->step]; }
static inline int Q(const Ln *l, int k) { return l->base[k * l->step]; }
static inline void setP(const Ln *l, int k, int v) { l->base[-(k + 1) * l->step] = v; }
static inline void setQ(const Ln *l, int k, int v) { l->base[k * l->step] = v; }

static inline int dp_(const Ln *l, int s)
{
    return abs(P(l, 2 + s) - 2 * P(l, 1 + s) + P(l, 0 + s));
}
static inline int dq_(const Ln *l, int s)
{
    return abs(Q(l, 0 + s) - 2 * Q(l, 1 + s) + Q(l, 2 + s));
}

static int strong_l0(const Ln *l, int beta, int tc, int mlp, int mlq)
{
    int sp3 = abs(P(l, 3) - P(l, 0));
    int sq3 = abs(Q(l, 3) - Q(l, 0));
    if (mlp == 7) {
        sp3 += abs(P(l, 4) - P(l, 5) - P(l, 6) + P(l, 7));
        sp3 = (sp3 + abs(P(l, 3) - P(l, 7)) + 1) >> 1;
    } else if (mlp == 5) {
        sp3 = (sp3 + abs(P(l, 3) - P(l, 5)) + 1) >> 1;
    }
    if (mlq == 7) {
        sq3 += abs(Q(l, 4) - Q(l, 5) - Q(l, 6) + Q(l, 7));
        sq3 = (sq3 + abs(Q(l, 7) - Q(l, 3)) + 1) >> 1;
    } else if (mlq == 5) {
        sq3 = (sq3 + abs(Q(l, 5) - Q(l, 3)) + 1) >> 1;
    }
    return (sp3 + sq3) < (beta * 3 >> 5)
        && abs(P(l, 0) - Q(l, 0)) < ((tc * 5 + 1) >> 1);
}

static int strong_l1(const Ln *l, int beta, int tc)
{
    int d = abs(P(l, 3) - P(l, 0)) + abs(Q(l, 3) - Q(l, 0));
    return d < (beta >> 3) && abs(P(l, 0) - Q(l, 0)) < ((tc * 5 + 1) >> 1);
}

static void long_filter(const Ln *lines, int mlp, int mlq, int tc)
{
    const int *wp = mlp == 7 ? DB_W7 : (mlp == 5 ? DB_W5 : DB_W3);
    const int *wq = mlq == 7 ? DB_W7 : (mlq == 5 ? DB_W5 : DB_W3);
    const int *tp = mlp == 7 ? TC_W7 : (mlp == 5 ? TC_W5 : TC_W3);
    const int *tq = mlq == 7 ? TC_W7 : (mlq == 5 ? TC_W5 : TC_W3);
    for (int i = 0; i < 4; i++) {
        const Ln *l = &lines[i];
        int ref_p = (P(l, mlp - 1) + P(l, mlp) + 1) >> 1;
        int ref_q = (Q(l, mlq - 1) + Q(l, mlq) + 1) >> 1;
        int mid;
        if (mlp == 7 && mlq == 7) {
            int s = 0;
            for (int k = 1; k < 7; k++) s += P(l, k) + Q(l, k);
            mid = (2 * (P(l, 0) + Q(l, 0)) + s + 8) >> 4;
        } else if ((mlp == 7 && mlq == 5) || (mlp == 5 && mlq == 7)) {
            int s = 0;
            for (int k = 2; k < 6; k++) s += P(l, k) + Q(l, k);
            mid = (2 * (P(l, 0) + P(l, 1) + Q(l, 0) + Q(l, 1)) + s + 8) >> 4;
        } else if (mlp == 5 && mlq == 5) {
            mid = (2 * (P(l, 0) + P(l, 1) + P(l, 2) + Q(l, 0) + Q(l, 1)
                        + Q(l, 2))
                   + P(l, 3) + P(l, 4) + Q(l, 3) + Q(l, 4) + 8) >> 4;
        } else if (mlp == 7 && mlq == 3) {
            int s = 0;
            for (int k = 1; k < 7; k++) s += P(l, k);
            mid = (2 * (P(l, 0) + Q(l, 0)) + s + Q(l, 0) + 3 * Q(l, 1)
                   + 2 * Q(l, 2) + 8) >> 4;
        } else if (mlp == 3 && mlq == 7) {
            int s = 0;
            for (int k = 1; k < 7; k++) s += Q(l, k);
            mid = (2 * (Q(l, 0) + P(l, 0)) + s + P(l, 0) + 3 * P(l, 1)
                   + 2 * P(l, 2) + 8) >> 4;
        } else { /* (5,3) or (3,5) */
            int s = 0;
            for (int k = 0; k < 4; k++) s += P(l, k) + Q(l, k);
            mid = (s + 4) >> 3;
        }
        for (int k = 0; k < mlp; k++) {
            int c = (tc * tp[k]) >> 1;
            int old = P(l, k);
            setP(l, k, iclamp_((mid * wp[k] + ref_p * (64 - wp[k]) + 32) >> 6,
                               old - c, old + c));
        }
        for (int k = 0; k < mlq; k++) {
            int c = (tc * tq[k]) >> 1;
            int old = Q(l, k);
            setQ(l, k, iclamp_((mid * wq[k] + ref_q * (64 - wq[k]) + 32) >> 6,
                               old - c, old + c));
        }
    }
}

static void strong_small(const Ln *lines, int tc)
{
    for (int i = 0; i < 4; i++) {
        const Ln *l = &lines[i];
        int p3 = P(l, 3), p2 = P(l, 2), p1 = P(l, 1), p0 = P(l, 0);
        int q0 = Q(l, 0), q1 = Q(l, 1), q2 = Q(l, 2), q3 = Q(l, 3);
        setP(l, 2, iclamp_((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                           p2 - tc, p2 + tc));
        setP(l, 1, iclamp_((p2 + p1 + p0 + q0 + 2) >> 2,
                           p1 - 2 * tc, p1 + 2 * tc));
        setP(l, 0, iclamp_((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                           p0 - 3 * tc, p0 + 3 * tc));
        setQ(l, 0, iclamp_((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
                           q0 - 3 * tc, q0 + 3 * tc));
        setQ(l, 1, iclamp_((p0 + q0 + q1 + q2 + 2) >> 2,
                           q1 - 2 * tc, q1 + 2 * tc));
        setQ(l, 2, iclamp_((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3,
                           q2 - tc, q2 + tc));
    }
}

static void weak_filter(const Ln *lines, int tc, int ext_p, int ext_q,
                        int bd_max)
{
    int th_cut = tc * 10;
    int tc2_p = ext_p ? tc >> 1 : 0;
    int tc2_q = ext_q ? tc >> 1 : 0;
    for (int i = 0; i < 4; i++) {
        const Ln *l = &lines[i];
        int p2 = P(l, 2), p1 = P(l, 1), p0 = P(l, 0);
        int q0 = Q(l, 0), q1 = Q(l, 1), q2 = Q(l, 2);
        int delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4;
        if (abs(delta) < th_cut) {
            delta = iclamp_(delta, -tc, tc);
            int d1 = iclamp_((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1,
                             -tc2_p, tc2_p);
            int d2 = iclamp_((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1,
                             -tc2_q, tc2_q);
            setP(l, 1, iclamp_(p1 + d1, 0, bd_max));
            setP(l, 0, iclamp_(p0 + delta, 0, bd_max));
            setQ(l, 0, iclamp_(q0 - delta, 0, bd_max));
            setQ(l, 1, iclamp_(q1 + d2, 0, bd_max));
        }
    }
}

/* decisions + filtering for one 4-line luma edge segment
 * (ref_dbf.py _filter_luma_segment) */
static void filter_luma_segment(const Ln *lines, int beta, int tc, int mlp,
                                int mlq, int bd_max)
{
    const Ln *l0 = &lines[0], *l3 = &lines[3];
    int dp0 = dp_(l0, 0), dq0 = dq_(l0, 0);
    int dp3 = dp_(l3, 0), dq3 = dq_(l3, 0);
    int d0 = dp0 + dq0, d3 = dp3 + dq3;
    if (d0 + d3 >= beta)
        return;
    int use_strong_large = 0;
    if (mlp > 3 || mlq > 3) {
        int dp0L = dp0, dq0L = dq0, dp3L = dp3, dq3L = dq3;
        if (mlp > 3) {
            dp0L = (dp0L + dp_(l0, 3) + 1) >> 1;
            dp3L = (dp3L + dp_(l3, 3) + 1) >> 1;
        }
        if (mlq > 3) {
            dq0L = (dq0L + dq_(l0, 3) + 1) >> 1;
            dq3L = (dq3L + dq_(l3, 3) + 1) >> 1;
        }
        int d0L = dp0L + dq0L, d3L = dp3L + dq3L;
        use_strong_large = (d0L + d3L) < beta
            && d0L < ((beta + 0x10) >> 5) && d3L < ((beta + 0x10) >> 5)
            && strong_l0(l0, beta, tc, mlp, mlq)
            && strong_l0(l3, beta, tc, mlp, mlq);
    }
    if (use_strong_large) {
        long_filter(lines, imax_(3, mlp), imax_(3, mlq), tc);
    } else {
        int sw = mlp > 2
            && d0 < ((beta + 0x4) >> 3) && d3 < ((beta + 0x4) >> 3)
            && strong_l1(l0, beta, tc) && strong_l1(l3, beta, tc);
        if (sw) {
            strong_small(lines, tc);
        } else {
            int dp = dp0 + dp3, dq = dq0 + dq3;
            int side_thd = (beta + (beta >> 1)) >> 3;
            int ext_p = dp < side_thd && mlp > 1;
            int ext_q = dq < side_thd && mlp > 1;
            weak_filter(lines, tc, ext_p, ext_q, bd_max);
        }
    }
}

/* ---- MV boundary strength (ref_dbf.py _mv_edge_bs) -------------------- */

static inline int mv_thr(const int32_t *a, const int32_t *b)
{
    return abs(a[0] - b[0]) >= 8 || abs(a[1] - b[1]) >= 8;
}

static int mv_edge_bs(const DbfBufs *m, int uw, int pu, int qu)
{
    int dpd = m->mv_dir[pu], dqd = m->mv_dir[qu];
    if (dpd == 0 || dqd == 0)
        return 1;
    if (dpd == 3 && dqd == 3) {
        const int32_t *p0 = m->mv_vals + pu * 4, *p1 = p0 + 2;
        const int32_t *q0 = m->mv_vals + qu * 4, *q1 = q0 + 2;
        int r0p = m->mv_dist[pu * 2], r1p = m->mv_dist[pu * 2 + 1];
        int r0q = m->mv_dist[qu * 2], r1q = m->mv_dist[qu * 2 + 1];
        int paired = r0p == r0q && r1p == r1q;
        int swapped = r0p == r1q && r1p == r0q;
        int coupled = r0p == r1p;
        int bs = 1;
        if (coupled && paired) {
            bs = mv_thr(q0, p0) || mv_thr(q1, p1);
            bs = bs && (mv_thr(q1, p0) || mv_thr(q0, p1));
        } else if (paired) {
            bs = mv_thr(q0, p0) || mv_thr(q1, p1);
        } else if (swapped) {
            bs = mv_thr(q1, p0) || mv_thr(q0, p1);
        }
        return bs;
    }
    if ((dpd == 1 || dpd == 2) && (dqd == 1 || dqd == 2)) {
        int lp = dpd - 1, lq = dqd - 1;
        const int32_t *mvp = m->mv_vals + pu * 4 + lp * 2;
        const int32_t *mvq = m->mv_vals + qu * 4 + lq * 2;
        if (m->mv_dist[pu * 2 + lp] == m->mv_dist[qu * 2 + lq])
            return mv_thr(mvq, mvp);
        return 1;
    }
    return 1;
}

/* ref_dbf.py finalize_inter_bs parity */
static void finalize_inter_bs(const DbfBufs *m, int uw, int uh)
{
    int mw = uw + 1;
    for (int yu = 0; yu < uh; yu++) {
        for (int xu = 1; xu < uw; xu++) {
            int e = yu * mw + xu;
            if (!((m->cu_edge_ver[e] | m->sb_edge_ver[e])
                  && !m->bs2_ver[e] && !m->bs1_ver[e]))
                continue;
            if (mv_edge_bs(m, uw, yu * uw + xu - 1, yu * uw + xu))
                m->bs1_ver[e] = 1;
        }
    }
    for (int yu = 1; yu < uh; yu++) {
        for (int xu = 0; xu < uw; xu++) {
            int e = yu * mw + xu;
            if (!((m->cu_edge_hor[e] | m->sb_edge_hor[e])
                  && !m->bs2_hor[e] && !m->bs1_hor[e]))
                continue;
            if (mv_edge_bs(m, uw, (yu - 1) * uw + xu, yu * uw + xu))
                m->bs1_hor[e] = 1;
        }
    }
}

/* ---- luma plane (ref_dbf.py deblock_plane_luma) ----------------------- */

static int in_list(const int32_t *lst, int n, int v)
{
    for (int i = 0; i < n; i++)
        if (lst[i] == v)
            return 1;
    return 0;
}

/* Vertical-edge pass over the yu band [yu_lo, yu_hi). A segment at
 * (xu, yu) writes only rows 4yu..4yu+3, so disjoint yu bands are
 * independent and run on separate threads. */
static void deblock_luma_ver(const DbfFrameParams *fp, const DbfBufs *m,
                             int32_t *plane, const int32_t *no_x,
                             int yu_lo, int yu_hi)
{
    int bd_max = (1 << fp->bitdepth) - 1;
    int uw = fp->pic_w / 4, uh = fp->pic_h / 4;
    int mw = uw + 1;
    int stride = fp->pic_w;
    const uint8_t *ev = m->edge_ver, *sv = m->sb_edge_ver;
    if (yu_hi > uh)
        yu_hi = uh;

    for (int xu = 1; xu < uw; xu++) {
        int x = xu * 4;
        if (in_list(no_x, fp->nb_no_x, x))
            continue;
        for (int yu = yu_lo; yu < yu_hi; yu++) {
            int e = yu * mw + xu;
            if (!(ev[e] | sv[e]))
                continue;
            int bs2 = m->bs2_ver[e];
            if (!(bs2 || m->bs1_ver[e]))
                continue;
            int qp = (m->qp_l[yu * uw + xu - 1] + m->qp_l[yu * uw + xu] + 1)
                     >> 1;
            int beta, tc;
            limits(qp, bs2 ? 2 : 1, fp->beta_off_l, fp->tc_off_l,
                   fp->bitdepth, &beta, &tc);
            if (!beta && !tc)
                continue;
            int small = ev[e - 1] | ev[e + 1] | sv[e - 1] | sv[e + 1];
            int pure_sb = sv[e] && !ev[e];
            int aff1 = pure_sb
                && ((xu >= 2 && ev[e - 2])
                    || (xu + 2 <= uw && ev[e + 2]));
            int mlp, mlq;
            if (small) {
                mlp = mlq = 1;
            } else if (aff1) {
                mlp = mlq = 2;
            } else {
                mlp = mlq = 3;
                if ((xu & 3) == 0 && !pure_sb) {
                    int lo = imax_(xu - 7, 0), any = 0;
                    for (int k = lo; k < xu; k++) any |= ev[yu * mw + k];
                    if (!any)
                        mlp = m->aff_unit[yu * uw + xu - 1] ? 5 : 7;
                    any = 0;
                    int hi = imin_(xu + 8, mw);
                    for (int k = xu + 1; k < hi; k++) any |= ev[yu * mw + k];
                    if (!any)
                        mlq = m->aff_unit[yu * uw + xu] ? 5 : 7;
                }
            }
            int y = yu * 4;
            Ln lines[4];
            for (int i = 0; i < 4; i++)
                lines[i] = (Ln){plane + (y + i) * stride + x, 1};
            filter_luma_segment(lines, beta, tc, mlp, mlq, bd_max);
        }
    }
}

/* Horizontal-edge pass over the xu band [xu_lo, xu_hi). Runs after ALL
 * vertical edges (normative order); a segment writes only columns
 * 4xu..4xu+3, so disjoint xu bands are independent. */
static void deblock_luma_hor(const DbfFrameParams *fp, const DbfBufs *m,
                             int32_t *plane, const int32_t *no_y,
                             int xu_lo, int xu_hi)
{
    int bd_max = (1 << fp->bitdepth) - 1;
    int uw = fp->pic_w / 4, uh = fp->pic_h / 4;
    int mw = uw + 1;
    int stride = fp->pic_w;
    const uint8_t *eh = m->edge_hor, *sh = m->sb_edge_hor;
    if (xu_hi > uw)
        xu_hi = uw;

    for (int yu = 1; yu < uh; yu++) {
        int y = yu * 4;
        if (in_list(no_y, fp->nb_no_y, y))
            continue;
        for (int xu = xu_lo; xu < xu_hi; xu++) {
            int e = yu * mw + xu;
            if (!(eh[e] | sh[e]))
                continue;
            int bs2 = m->bs2_hor[e];
            if (!(bs2 || m->bs1_hor[e]))
                continue;
            int qp = (m->qp_l[(yu - 1) * uw + xu] + m->qp_l[yu * uw + xu] + 1)
                     >> 1;
            int beta, tc;
            limits(qp, bs2 ? 2 : 1, fp->beta_off_l, fp->tc_off_l,
                   fp->bitdepth, &beta, &tc);
            if (!beta && !tc)
                continue;
            int small = eh[e - mw] | eh[e + mw] | sh[e - mw] | sh[e + mw];
            int pure_sb = sh[e] && !eh[e];
            int aff1 = pure_sb
                && ((yu >= 2 && eh[e - 2 * mw])
                    || (yu + 2 <= uh && eh[e + 2 * mw]));
            int mlp, mlq;
            if (small) {
                mlp = mlq = 1;
            } else if (aff1) {
                mlp = mlq = 2;
            } else {
                mlp = mlq = 3;
                if ((yu & 3) == 0 && !pure_sb) {
                    /* long-P suppressed in the first 7 unit rows of each
                     * CTU (rcn_df.c:2146 `i % 4 || i < 7`, i CTU-local) */
                    int ucb = (1 << fp->log2_ctb) >> 2;
                    if ((yu % ucb) >= 7) {
                        int any = 0;
                        for (int k = yu - 7; k < yu; k++)
                            any |= eh[k * mw + xu];
                        if (!any)
                            mlp = m->aff_unit[(yu - 1) * uw + xu] ? 5 : 7;
                    }
                    int any = 0;
                    int hi = imin_(yu + 8, uh + 1);
                    for (int k = yu + 1; k < hi; k++) any |= eh[k * mw + xu];
                    if (!any)
                        mlq = m->aff_unit[yu * uw + xu] ? 5 : 7;
                }
            }
            int x = xu * 4;
            Ln lines[4];
            for (int i = 0; i < 4; i++)
                lines[i] = (Ln){plane + y * stride + x + i, stride};
            filter_luma_segment(lines, beta, tc, mlp, mlq, bd_max);
        }
    }
}

/* ---- chroma (ref_dbf.py deblock_chroma) -------------------------------- */

static void chroma_strong(const Ln *lines, int nl, int tc, int ctb_b)
{
    for (int i = 0; i < nl; i++) {
        const Ln *l = &lines[i];
        int p0 = P(l, 0), p1 = P(l, 1), p2 = P(l, 2), p3 = P(l, 3);
        int q0 = Q(l, 0), q1 = Q(l, 1), q2 = Q(l, 2), q3 = Q(l, 3);
        if (ctb_b) {
            setP(l, 0, iclamp_((3 * p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3,
                               p0 - tc, p0 + tc));
            setQ(l, 0, iclamp_((2 * p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3,
                               q0 - tc, q0 + tc));
            setQ(l, 1, iclamp_((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3,
                               q1 - tc, q1 + tc));
            setQ(l, 2, iclamp_((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3,
                               q2 - tc, q2 + tc));
        } else {
            setP(l, 2, iclamp_((3 * p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3,
                               p2 - tc, p2 + tc));
            setP(l, 1, iclamp_((2 * p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3,
                               p1 - tc, p1 + tc));
            setP(l, 0, iclamp_((p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3,
                               p0 - tc, p0 + tc));
            setQ(l, 0, iclamp_((p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3,
                               q0 - tc, q0 + tc));
            setQ(l, 1, iclamp_((p1 + p0 + q0 + 2 * q1 + q2 + 2 * q3 + 4) >> 3,
                               q1 - tc, q1 + tc));
            setQ(l, 2, iclamp_((p0 + q0 + q1 + 2 * q2 + 3 * q3 + 4) >> 3,
                               q2 - tc, q2 + tc));
        }
    }
}

static void chroma_weak(const Ln *lines, int nl, int tc, int bd_max)
{
    for (int i = 0; i < nl; i++) {
        const Ln *l = &lines[i];
        int p1 = P(l, 1), p0 = P(l, 0), q0 = Q(l, 0), q1 = Q(l, 1);
        int delta = iclamp_(((q0 << 2) - (p0 << 2) + p1 - q1 + 4) >> 3,
                            -tc, tc);
        setP(l, 0, iclamp_(p0 + delta, 0, bd_max));
        setQ(l, 0, iclamp_(q0 - delta, 0, bd_max));
    }
}

static void filter_chroma_edge(const Ln *lines, int qp, int bs2, int large,
                               int beta_off, int tc_off, int bitdepth,
                               int ctb_b)
{
    int bd_max = (1 << bitdepth) - 1;
    int beta, tc;
    limits(qp, bs2 ? 2 : 1, beta_off, tc_off, bitdepth, &beta, &tc);
    if (tc == 0 || beta == 0)
        return;
    int strong = 0;
    if (large) {
        const Ln *l0 = &lines[0], *l1 = &lines[1];
        /* dpc: p-index 1 when at the CTU top line, else 2 */
        int pi = ctb_b ? 1 : 2;
        int d0 = abs(P(l0, pi) - 2 * P(l0, 1) + P(l0, 0)) + dq_(l0, 0);
        int d3 = abs(P(l1, pi) - 2 * P(l1, 1) + P(l1, 0)) + dq_(l1, 0);
        int d = d0 + d3;
        int p3i = ctb_b ? 1 : 3;
        int s0 = (abs(P(l0, p3i) - P(l0, 0)) + abs(Q(l0, 3) - Q(l0, 0)))
                     < (beta >> 3)
                 && abs(P(l0, 0) - Q(l0, 0)) < ((tc * 5 + 1) >> 1);
        int s1 = (abs(P(l1, p3i) - P(l1, 0)) + abs(Q(l1, 3) - Q(l1, 0)))
                     < (beta >> 3)
                 && abs(P(l1, 0) - Q(l1, 0)) < ((tc * 5 + 1) >> 1);
        strong = d < beta && 2 * d0 < (beta >> 2) && 2 * d3 < (beta >> 2)
                 && s0 && s1;
    }
    if (strong)
        chroma_strong(lines, 2, tc, ctb_b);
    else
        chroma_weak(lines, 2, tc, bd_max);
}

static void deblock_chroma_plane(const DbfFrameParams *fp, const DbfBufs *m,
                                 int32_t *plane, const uint8_t *bs1v,
                                 const uint8_t *bs1h, const int32_t *qpm,
                                 int beta_off, int tc_off,
                                 const int32_t *no_x, const int32_t *no_y)
{
    int uw = fp->pic_w / 4, uh = fp->pic_h / 4;
    int mw = uw + 1;
    int cstride = fp->pic_w >> 1;

    for (int xu = 4; xu < uw; xu += 4) {
        if (in_list(no_x, fp->nb_no_x, xu * 4))
            continue;
        int cx = xu * 2;
        for (int yu = 0; yu < uh; yu++) {
            int e = yu * mw + xu;
            if (!m->cedge_ver[e])
                continue;
            int bs2 = m->cbs2_ver[e];
            int bs1 = bs1v[e];
            int any = 0;
            for (int k = imax_(0, xu - 3); k < xu; k++)
                any |= m->cedge_ver[yu * mw + k];
            for (int k = xu + 1; k < imin_(xu + 4, mw); k++)
                any |= m->cedge_ver[yu * mw + k];
            int large = !any;
            if (!(bs2 || (bs1 && large)))
                continue;
            int qp = (qpm[yu * uw + xu - 1] + qpm[yu * uw + xu] + 1) >> 1;
            int cy = yu * 2;
            Ln lines[2];
            for (int i = 0; i < 2; i++)
                lines[i] = (Ln){plane + (cy + i) * cstride + cx, 1};
            filter_chroma_edge(lines, qp, bs2, large, beta_off, tc_off,
                               fp->bitdepth, 0);
        }
    }
    for (int yu = 4; yu < uh; yu += 4) {
        if (in_list(no_y, fp->nb_no_y, yu * 4))
            continue;
        int cy = yu * 2;
        int is_ctb_b = ((cy * 2) & ((1 << fp->log2_ctb) - 1)) == 0;
        for (int xu = 0; xu < uw; xu++) {
            int e = yu * mw + xu;
            if (!m->cedge_hor[e])
                continue;
            int bs2 = m->cbs2_hor[e];
            int bs1 = bs1h[e];
            int any = 0;
            for (int k = imax_(0, yu - 3); k < yu; k++)
                any |= m->cedge_hor[k * mw + xu];
            for (int k = yu + 1; k < imin_(yu + 4, uh + 1); k++)
                any |= m->cedge_hor[k * mw + xu];
            int large = !any;
            if (!(bs2 || (bs1 && large)))
                continue;
            int qp = (qpm[(yu - 1) * uw + xu] + qpm[yu * uw + xu] + 1) >> 1;
            int cx = xu * 2;
            Ln lines[2];
            for (int i = 0; i < 2; i++)
                lines[i] = (Ln){plane + cy * cstride + cx + i, cstride};
            filter_chroma_edge(lines, qp, bs2, large, beta_off, tc_off,
                               fp->bitdepth, is_ctb_b);
        }
    }
}

/* ---- entry point ------------------------------------------------------- */

/* part selects a unit of work so the decoder can schedule the filter
 * across threads (all units are mutually independent except for the
 * barriers noted):
 *   0 = whole frame
 *   1 = luma only (incl. the inter-bs finalize)   2 = chroma only
 *   3 = inter-bs finalize only (writes luma bs1 maps; run before 4/5)
 *   4 = luma vertical-edge band, yu in [lo, hi)   (after 3)
 *   5 = luma horizontal-edge band, xu in [lo, hi) (after ALL of 4)
 *   6 = chroma Cb plane                           7 = chroma Cr plane */
int64_t ov_dbf_frame_part(const DbfFrameParams *fp, const DbfBufs *m,
                          int32_t *fy, int32_t *fcb, int32_t *fcr,
                          const int32_t *no_x, const int32_t *no_y,
                          int part, int lo, int hi)
{
    int uw = fp->pic_w / 4, uh = fp->pic_h / 4;
    int chroma = fp->chroma_enabled && fcb && fcr;
    switch (part) {
    case 0:
    case 1:
        if (fp->finalize_inter_bs)
            finalize_inter_bs(m, uw, uh);
        deblock_luma_ver(fp, m, fy, no_x, 0, uh);
        deblock_luma_hor(fp, m, fy, no_y, 0, uw);
        if (part == 1)
            return 0;
        /* fall through: part 0 continues with chroma */
        break;
    case 3:
        if (fp->finalize_inter_bs)
            finalize_inter_bs(m, uw, uh);
        return 0;
    case 4:
        deblock_luma_ver(fp, m, fy, no_x, lo, hi);
        return 0;
    case 5:
        deblock_luma_hor(fp, m, fy, no_y, lo, hi);
        return 0;
    case 6:
        if (chroma)
            deblock_chroma_plane(fp, m, fcb, m->cbs1_cb_ver, m->cbs1_cb_hor,
                                 m->qp_cb, fp->beta_off_cb, fp->tc_off_cb,
                                 no_x, no_y);
        return 0;
    case 7:
        if (chroma)
            deblock_chroma_plane(fp, m, fcr, m->cbs1_cr_ver, m->cbs1_cr_hor,
                                 m->qp_cr, fp->beta_off_cr, fp->tc_off_cr,
                                 no_x, no_y);
        return 0;
    }
    if (chroma) {
        deblock_chroma_plane(fp, m, fcb, m->cbs1_cb_ver, m->cbs1_cb_hor,
                             m->qp_cb, fp->beta_off_cb, fp->tc_off_cb,
                             no_x, no_y);
        deblock_chroma_plane(fp, m, fcr, m->cbs1_cr_ver, m->cbs1_cr_hor,
                             m->qp_cr, fp->beta_off_cr, fp->tc_off_cr,
                             no_x, no_y);
    }
    return 0;
}

int64_t ov_dbf_frame(const DbfFrameParams *fp, const DbfBufs *m, int32_t *fy,
                     int32_t *fcb, int32_t *fcr, const int32_t *no_x,
                     const int32_t *no_y)
{
    return ov_dbf_frame_part(fp, m, fy, fcb, fcr, no_x, no_y, 0, 0, 0);
}
