/* Native full-entry CABAC parser for the host runtime.
 *
 * Translates the repo's own oracle-validated Python parse layer
 * (openvvc_tpu/vcl/{coding_tree,coding_unit,inter_pu,transform_unit,
 * slice_data,sao}.py and openvvc_tpu/drv/inter_mvp.py) into C, emitting a
 * flat SoA record stream (CU table / TU table / coefficient buffer / SAO
 * table / MV field exports) that the Python side converts into the CTU IR
 * or feeds directly to batched reconstruction.
 *
 * Coverage is feature-gated: the Python wrapper calls this only when the
 * active parameter set stays inside the supported toolset; in addition any
 * unexpected mid-parse construct (SCIPU separate trees, 4x4 inter) bails
 * out via longjmp and the caller re-parses the entry in Python. Behavior
 * parity target (same as the Python layer):
 * /root/reference/libovvc/vcl_coding_tree.c, vcl_coding_unit.c,
 * vcl_transform_unit.c, vcl_sao.c, drv_mvp.c, slicedec.c.
 */

#include <setjmp.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---- CABAC engine (cabac_inl.h; extern calls — the coding-tree layer
 * has hundreds of call sites and inlining them all costs icache) ------ */
#include "cabac_inl.h"
int cabac_decode_bin(CabacDec *d, int ctx_idx);
int cabac_decode_bypass(CabacDec *d);
uint32_t cabac_decode_bypass_bits(CabacDec *d, int n);
int cabac_decode_terminate(CabacDec *d);

/* residual.c */
int64_t rc_decode_tb(CabacDec *d, int32_t *levels, int32_t *decoded,
                     int log2_w, int log2_h, int luma, int dep_quant, int sdh,
                     int mts_reduced, uint64_t *sig_sb_map_out);

/* ---- context offsets (cabac/ctx.py CtxOffset) ----------------------- */
enum {
    SPLIT_FLAG = 0,
    SPLIT_QT_FLAG = 9,
    SPLIT_HV_FLAG = 15,
    SPLIT12_FLAG = 20,
    MODE_CONS_FLAG = 24,
    SKIP_FLAG = 26,
    MERGE_FLAG = 29,
    REGULAR_MERGE_FLAG = 30,
    MERGE_IDX = 32,
    MMVD_FLAG = 33,
    MMVD_MERGE_IDX = 34,
    MMVD_STEP_MVP_IDX = 35,
    PRED_MODE = 36,
    MULTI_REF_LINE_IDX = 38,
    INTRA_LUMA_MPM_FLAG = 40,
    INTRA_LUMA_PLANAR_FLAG = 41,
    CCLM_MODE_FLAG = 43,
    CCLM_MODE_IDX = 44,
    INTRA_CHROMA_PRED_MODE = 45,
    MIP_FLAG = 46,
    DELTA_QP = 50,
    INTER_DIR = 52,
    REF_PIC = 58,
    SUBBLOCK_MERGE_FLAG = 60,
    AFFINE_FLAG = 63,
    AFFINE_TYPE = 66,
    AFF_MERGE_IDX = 67,
    BCW_IDX = 68,
    MVD = 69,
    BDPCM_MODE = 71,
    QT_ROOT_CBF = 75,
    QT_CBF = 77,
    QT_CBF_CB = 81,
    QT_CBF_CR = 83,
    MVP_IDX = 292,
    SMVD_FLAG = 293,
    SAO_MERGE_FLAG = 294,
    SAO_TYPE_IDX = 295,
    LFNST_IDX = 296,
    TRANSFORM_SKIP_FLAG = 314,
    MTS_IDX = 316,
    SBT_FLAG = 322,
    IMV_FLAG = 341,
    CTB_ALF_FLAG = 346,
    CTB_ALF_ALTERNATIVE = 355,
    ALF_USE_TEMPORAL_FILT = 357,
    CC_ALF_FILTER_CONTROL_FLAG = 358,
    CIIP_FLAG = 364,
    IBC_FLAG = 365,
    JOINT_CB_CR_FLAG = 368,
    TS_SIG_COEFF_GROUP = 371,
    TS_SIG_FLAG = 374,
    TS_PAR_FLAG = 377,
    TS_GTX_FLAG = 378,
    TS_LRG1_FLAG = 383,
    TS_RESIDUAL_SIGN = 387,
};

#include "ov_shared.h"
#include "gpm_inl.h"

typedef struct { int32_t x, y; int8_t ref, bcw, prec; } MVc;

typedef struct {
    CabacDec *cab;
    const EntryParams *ep;
    jmp_buf env;

    /* neighbor maps at 4x4 luma units over the tile */
    int uw, uh;
    uint8_t *m_log2w, *m_log2h, *m_qtd, *m_imode, *m_pmode, *m_ctype;
    /* chroma-tree maps exist for parity but single-tree only mirrors them */
    int cw, ch;
    uint8_t *cm_log2w, *cm_log2h, *cm_qtd;

    /* delta-QP state */
    int qp, cu_qp_delta, is_qp_delta_coded;
    int32_t qp_map_x[64], qp_map_y[64];

    /* inter derivation state (per list) */
    uint8_t *dir0, *dir1; /* [uh][uw] */
    MVc *mv0, *mv1;       /* [uh][uw] */
    /* affine state (drv/affine.py AffineCtx) */
    uint8_t *aff_dir;     /* [uh][uw] */
    int32_t *aff_idx;     /* [uh][uw] -> aff_pool index, -1 none */
    struct AffInfoC_ *aff_pool;
    int64_t aff_n, aff_cap;
    int32_t *sub_mv;      /* per-unit MV export [uh][uw][2][2], nullable */
    MVc hmvp_mv0[5], hmvp_mv1[5];
    uint8_t hmvp_dir[5];
    int hmvp_n;
    int prec_amvr;
    /* TMVP export (8x8 grid) */
    int uw8, uh8;
    int32_t *tmv0, *tmv1; /* [uh8][uw8][3] x,y,ref */
    /* collocated picture field (picture-level grids) */
    const uint8_t *col_dir0, *col_dir1;  /* [col_uh][col_uw] */
    const int32_t *col_mv0, *col_mv1;    /* [col_uh8][col_uw8][3] */

    /* tree-walk state */
    int tree_type, share;
    int slice_is_intra;

    /* per-CU scratch */
    int cur_ctu;

    /* ALF / CC-ALF neighbour-flag state (vcl/alf.py parity) */
    int alf_left_flag;
    int cc_left[2];
    uint8_t *alf_line;      /* [nb_ctu_w] */
    uint8_t *cc_line[2];    /* [nb_ctu_w] each */

    /* outputs */
    int32_t *cu_buf; int64_t cu_cap, ncu;
    int32_t *tu_buf; int64_t tu_cap, ntu;
    int32_t *coef;   int64_t coef_cap, ncoef;
    int32_t *sao_buf;
    int32_t *ctu_ncu;
    int32_t lvl_scratch[64 * 64];
} Pc;

static void bail(Pc *p, int code) { longjmp(p->env, -code); }

static int32_t *cu_rec(Pc *p, int64_t i) { return p->cu_buf + i * CU_NFIELDS; }
static int32_t *tu_rec(Pc *p, int64_t i) { return p->tu_buf + i * TU_NFIELDS; }

static int64_t new_cu(Pc *p, int x0, int y0, int l2w, int l2h)
{
    if (p->ncu >= p->cu_cap) bail(p, -4);
    int32_t *c = cu_rec(p, p->ncu);
    memset(c, 0, sizeof(int32_t) * CU_NFIELDS);
    c[CU_F_X0] = x0; c[CU_F_Y0] = y0;
    c[CU_F_LOG2W] = l2w; c[CU_F_LOG2H] = l2h;
    c[CU_F_TREE] = TREE_SINGLE;
    c[CU_F_INTER_DIR] = 1;
    c[CU_F_MV0REF] = -1; /* marks "no mv" for the converter */
    c[CU_F_MV1REF] = -1;
    c[CU_F_ROOT_CBF] = 1;
    c[CU_F_PREC_EFF] = PREC_QUARTER;
    c[CU_F_TU0] = (int32_t)p->ntu;
    c[CU_F_CTU] = p->cur_ctu;
    c[CU_F_COL_MODE] = -1;
    return p->ncu++;
}

static int64_t new_tu(Pc *p, int comp, int x0, int y0, int l2w, int l2h)
{
    if (p->ntu >= p->tu_cap) bail(p, -5);
    int32_t *t = tu_rec(p, p->ntu);
    memset(t, 0, sizeof(int32_t) * TU_NFIELDS);
    t[TU_F_COMP] = comp;
    t[TU_F_X0] = x0; t[TU_F_Y0] = y0;
    t[TU_F_LOG2W] = l2w; t[TU_F_LOG2H] = l2h;
    t[TU_F_CBF] = 1;
    t[TU_F_COEF] = -1;
    return p->ntu++;
}

/* ---- neighbor-map helpers ------------------------------------------- */
static int in_tile(const Pc *p, int x, int y)
{
    const EntryParams *e = p->ep;
    return x >= e->tile_x0 && x < e->tile_x0 + e->tile_w &&
           y >= e->tile_y0 && y < e->tile_y0 + e->tile_h;
}

static int lu_x(const Pc *p, int x) { return (x - p->ep->tile_x0) >> 2; }
static int lu_y(const Pc *p, int y) { return (y - p->ep->tile_y0) >> 2; }

#define MAPAT(m, p, ux, uy) ((m)[(uy) * (p)->uw + (ux)])

static int nbr_u8(const Pc *p, const uint8_t *m, int x, int y, int dflt)
{
    if (!in_tile(p, x, y)) return dflt;
    return MAPAT(m, p, lu_x(p, x), lu_y(p, y));
}

static void map_fill(Pc *p, uint8_t *m, int x0, int y0, int l2w, int l2h, int v)
{
    int ux = lu_x(p, x0), uy = lu_y(p, y0);
    int wu = (1 << l2w) >> 2; if (wu < 1) wu = 1;
    int hu = (1 << l2h) >> 2; if (hu < 1) hu = 1;
    if (ux + wu > p->uw) wu = p->uw - ux; /* numpy-slice clipping parity */
    if (uy + hu > p->uh) hu = p->uh - uy;
    for (int j = 0; j < hu; j++)
        memset(m + (uy + j) * p->uw + ux, v, wu);
}

/* store_cu_luma parity */
static void store_cu_luma(Pc *p, const int32_t *c)
{
    int x0 = c[CU_F_X0], y0 = c[CU_F_Y0];
    int l2w = c[CU_F_LOG2W], l2h = c[CU_F_LOG2H];
    map_fill(p, p->m_log2w, x0, y0, l2w, l2h, l2w);
    map_fill(p, p->m_log2h, x0, y0, l2w, l2h, l2h);
    int imode = UNAVAIL;
    if (c[CU_F_PRED] == MODE_INTRA)
        imode = c[CU_F_MIP_FLAG] ? INTRA_PLANAR : c[CU_F_INTRA_L];
    map_fill(p, p->m_imode, x0, y0, l2w, l2h, imode);
    map_fill(p, p->m_pmode, x0, y0, l2w, l2h, c[CU_F_PRED]);
}

/* reset_intra_map parity (slice_data.py) */
static void reset_intra_map(Pc *p, int x0, int y0, int l2w, int l2h)
{
    map_fill(p, p->m_imode, x0, y0, l2w, l2h, UNAVAIL);
    map_fill(p, p->m_log2w, x0, y0, l2w, l2h, l2w);
    map_fill(p, p->m_log2h, x0, y0, l2w, l2h, l2h);
    map_fill(p, p->m_pmode, x0, y0, l2w, l2h, MODE_INTER);
}

/* chroma-map mirrors (single tree) */
static void store_cu_chroma(Pc *p, int cx0, int cy0, int l2w, int l2h)
{
    if (!p->ep->chroma_enabled) return;
    int ux = (cx0 - (p->ep->tile_x0 >> 1)) >> 2;
    int uy = (cy0 - (p->ep->tile_y0 >> 1)) >> 2;
    int wu = (1 << l2w) >> 2; if (wu < 1) wu = 1;
    int hu = (1 << l2h) >> 2; if (hu < 1) hu = 1;
    if (ux + wu > p->cw) wu = p->cw - ux; /* numpy-slice clipping parity */
    if (uy + hu > p->ch) hu = p->ch - uy;
    for (int j = 0; j < hu; j++) {
        memset(p->cm_log2w + (uy + j) * p->cw + ux, l2w, wu);
        memset(p->cm_log2h + (uy + j) * p->cw + ux, l2h, wu);
    }
}

static void store_qt_depth_chroma(Pc *p, int cx0, int cy0, int l2s, int d)
{
    if (!p->ep->chroma_enabled) return;
    int ux = (cx0 - (p->ep->tile_x0 >> 1)) >> 2;
    int uy = (cy0 - (p->ep->tile_y0 >> 1)) >> 2;
    int n = (1 << l2s) >> 2; if (n < 1) n = 1;
    int nw = n, nh = n;
    if (ux + nw > p->cw) nw = p->cw - ux; /* numpy-slice clipping parity */
    if (uy + nh > p->ch) nh = p->ch - uy;
    for (int j = 0; j < nh; j++)
        memset(p->cm_qtd + (uy + j) * p->cw + ux, d, nw);
}

static void store_qt_depth_luma(Pc *p, int x0, int y0, int l2s, int d)
{
    int ux = lu_x(p, x0), uy = lu_y(p, y0);
    int n = (1 << l2s) >> 2; if (n < 1) n = 1;
    int nw = n, nh = n;
    if (ux + nw > p->uw) nw = p->uw - ux; /* numpy-slice clipping parity */
    if (uy + nh > p->uh) nh = p->uh - uy;
    for (int j = 0; j < nh; j++)
        memset(p->m_qtd + (uy + j) * p->uw + ux, d, nw);
    /* shared-tree chroma follows luma qt depth */
    if (!p->share && p->tree_type == TREE_SINGLE && p->ep->chroma_enabled)
        store_qt_depth_chroma(p, x0 >> 1, y0 >> 1, l2s - 1, d);
}

/* ---- bypass binarizations ------------------------------------------- */
static int truncated_binary(Pc *p, int cmax)
{
    int n = cmax + 1, k = 0;
    while ((2 << k) <= n) k++;           /* k = floor(log2(n)) */
    int u = (1 << (k + 1)) - n;
    int v = (int)cabac_decode_bypass_bits(p->cab, k);
    if (v >= u) {
        v = (v << 1) | cabac_decode_bypass(p->cab);
        v -= u;
    }
    return v;
}

static int eg_bypass(Pc *p) /* delta-qp EG0 tail (transform_unit.py) */
{
    int symbol = 0, count = 0;
    while (cabac_decode_bypass(p->cab) && count <= 32) {
        symbol += 1 << count;
        count += 1;
    }
    int add = 0;
    for (int i = 0; i < count; i++)
        add = (add << 1) | cabac_decode_bypass(p->cab);
    return symbol + add;
}

static int exp_golomb_mv(Pc *p) /* vvc_exp_golomb_mv parity */
{
    int prefix = 0, bit = 1;
    do {
        prefix += 1;
        bit = cabac_decode_bypass(p->cab);
    } while (bit && prefix < 15);
    prefix -= 1 - bit;
    int offset = ((1 << prefix) - 1) << 1;
    int length = 1 + (prefix == 15 ? 16 : prefix);
    int add = 0;
    for (int i = 0; i < length; i++)
        add = (add << 1) | cabac_decode_bypass(p->cab);
    return offset + add;
}

/* ---- MPM (coding_unit.py derive_mpm_list parity) -------------------- */
static void derive_mpm_list(int lft, int abv, int lst[6])
{
    const int offset = 61, mod = 64;
#define M(v) (((v) % mod) + 2)
    lst[0] = INTRA_PLANAR; lst[1] = INTRA_DC; lst[2] = OV_VER;
    lst[3] = OV_HOR; lst[4] = OV_VER - 4; lst[5] = OV_VER + 4;
    if (lft == abv) {
        if (lft > INTRA_DC) {
            lst[0] = INTRA_PLANAR; lst[1] = lft;
            lst[2] = M(lft + offset); lst[3] = M(lft - 1);
            lst[4] = M(lft + offset - 1); lst[5] = M(lft);
        }
    } else if (lft > INTRA_DC && abv > INTRA_DC) {
        int lo = lft < abv ? lft : abv;
        int hi = lft < abv ? abv : lft;
        int diff = hi - lo;
        lst[0] = INTRA_PLANAR; lst[1] = lft; lst[2] = abv;
        if (diff == 1) {
            lst[3] = M(lo + offset); lst[4] = M(hi - 1); lst[5] = M(lo + offset - 1);
        } else if (diff >= 62) {
            lst[3] = M(lo - 1); lst[4] = M(hi + offset); lst[5] = M(lo);
        } else if (diff == 2) {
            lst[3] = M(lo - 1); lst[4] = M(lo + offset); lst[5] = M(hi - 1);
        } else {
            lst[3] = M(lo + offset); lst[4] = M(lo - 1); lst[5] = M(hi + offset);
        }
    } else if (lft + abv >= 2) {
        int big = lft > abv ? lft : abv;
        lst[0] = INTRA_PLANAR; lst[1] = big; lst[2] = M(big + offset);
        lst[3] = M(big - 1); lst[4] = M(big + offset - 1); lst[5] = M(big);
    }
#undef M
}

static int mode_from_mpm_remainder(int lft, int abv, int rem)
{
    int lst[6];
    derive_mpm_list(lft, abv, lst);
    /* sort the 6 entries ascending */
    for (int i = 1; i < 6; i++)
        for (int j = i; j > 0 && lst[j] < lst[j - 1]; j--) {
            int t = lst[j]; lst[j] = lst[j - 1]; lst[j - 1] = t;
        }
    int mode = rem;
    for (int i = 0; i < 6; i++)
        if (mode >= lst[i]) mode += 1;
    return mode;
}

/* _mpm_candidates parity */
static void mpm_candidates(Pc *p, int x0, int y0, int l2w, int l2h,
                           int *lft_out, int *abv_out)
{
    int lx = x0 - 1, ly = y0 + (1 << l2h) - 1;
    int ax = x0 + (1 << l2w) - 1, ay = y0 - 1;
    int lft = nbr_u8(p, p->m_imode, lx, ly, UNAVAIL);
    if (lft == UNAVAIL) lft = INTRA_PLANAR;
    int abv;
    if ((ay >> p->ep->log2_ctb) != (y0 >> p->ep->log2_ctb)) {
        abv = INTRA_PLANAR;
    } else {
        abv = nbr_u8(p, p->m_imode, ax, ay, UNAVAIL);
        if (abv == UNAVAIL) abv = INTRA_PLANAR;
    }
    *lft_out = lft; *abv_out = abv;
}

static int nb_mip_modes(int l2w, int l2h)
{
    if (l2w == 2 && l2h == 2) return 16;
    if (l2w == 2 || l2h == 2 || (l2w == 3 && l2h == 3)) return 8;
    return 6;
}

/* coding_unit_intra_luma parity (BDPCM/ISP pre-gated off by the wrapper) */
static void cu_intra_luma(Pc *p, int32_t *c)
{
    const EntryParams *e = p->ep;
    int x0 = c[CU_F_X0], y0 = c[CU_F_Y0];
    int l2w = c[CU_F_LOG2W], l2h = c[CU_F_LOG2H];

    /* BDPCM (coding_unit.py coding_unit_intra_luma :150): pure H/V copy
     * prediction + TS residual accumulation */
    if (e->bdpcm_enabled && l2w <= e->log2_ts_max && l2h <= e->log2_ts_max) {
        if (cabac_decode_bin(p->cab, BDPCM_MODE)) {
            int dir = cabac_decode_bin(p->cab, BDPCM_MODE + 1);
            c[CU_F_BDPCM] |= 1 | (dir << 1);
            c[CU_F_INTRA_L] = dir ? OV_VER : OV_HOR;
            return;
        }
    }

    if (e->mip) {
        int ux = lu_x(p, x0), uy = lu_y(p, y0);
        int abv_mip = in_tile(p, x0, y0 - 1) &&
                      MAPAT(p->m_ctype, p, ux, uy - 1) == CU_MIP;
        int lft_mip = in_tile(p, x0 - 1, y0) &&
                      MAPAT(p->m_ctype, p, ux - 1, uy) == CU_MIP;
        int cx;
        int dlh = l2h - l2w; if (dlh < 0) dlh = -dlh;
        cx = dlh > 1 ? 3 : abv_mip + lft_mip;
        c[CU_F_MIP_FLAG] = cabac_decode_bin(p->cab, MIP_FLAG + cx);
        if (c[CU_F_MIP_FLAG]) {
            c[CU_F_MIP_T] = cabac_decode_bypass(p->cab);
            c[CU_F_MIP_MODE] = truncated_binary(p, nb_mip_modes(l2w, l2h) - 1);
            c[CU_F_INTRA_L] = INTRA_PLANAR;
            return;
        }
    }

    int mrl = 0;
    if (e->mrl && (y0 % (1 << e->log2_ctb)) != 0) {
        mrl = cabac_decode_bin(p->cab, MULTI_REF_LINE_IDX);
        if (mrl)
            mrl += cabac_decode_bin(p->cab, MULTI_REF_LINE_IDX + 1);
    }
    c[CU_F_MRL] = mrl;

    /* ISP pre-gated off */

    int lft, abv;
    mpm_candidates(p, x0, y0, l2w, l2h, &lft, &abv);

    int mpm_flag = mrl ? 1 : cabac_decode_bin(p->cab, INTRA_LUMA_MPM_FLAG);
    if (mpm_flag) {
        int mpm_idx;
        if (mrl == 0)
            mpm_idx = cabac_decode_bin(p->cab, INTRA_LUMA_PLANAR_FLAG + 1);
        else
            mpm_idx = 1;
        while (mpm_idx && mpm_idx < 5) {
            if (!cabac_decode_bypass(p->cab)) break;
            mpm_idx += 1;
        }
        int lst[6];
        derive_mpm_list(lft, abv, lst);
        c[CU_F_INTRA_L] = lst[mpm_idx];
    } else {
        int rem = truncated_binary(p, 60);
        c[CU_F_INTRA_L] = mode_from_mpm_remainder(lft, abv, rem);
    }
}

/* coding_unit_intra_chroma parity (BDPCM pre-gated off; single tree) */
static void cu_intra_chroma(Pc *p, int32_t *c, int col_mode)
{
    const EntryParams *e = p->ep;
    int cl2w = c[CU_F_LOG2W] - 1, cl2h = c[CU_F_LOG2H] - 1;
    if (e->bdpcm_enabled && cl2w <= e->log2_ts_max
        && cl2h <= e->log2_ts_max) {
        if (cabac_decode_bin(p->cab, BDPCM_MODE + 2)) {
            int dir = cabac_decode_bin(p->cab, BDPCM_MODE + 3);
            c[CU_F_BDPCM] |= 4 | (dir << 3);
            c[CU_F_INTRA_C] = dir ? OV_VER : OV_HOR;
            return;
        }
    }
    if (e->cclm) { /* single tree: cclm_allowed() is always true */
        if (cabac_decode_bin(p->cab, CCLM_MODE_FLAG)) {
            int idx = cabac_decode_bin(p->cab, CCLM_MODE_IDX);
            if (idx)
                idx += cabac_decode_bypass(p->cab);
            c[CU_F_INTRA_C] = (int[]){INTRA_LT_CCLM, INTRA_L_CCLM, INTRA_T_CCLM}[idx];
            return;
        }
    }
    static const int mode_list[4] = {INTRA_PLANAR, OV_VER, OV_HOR, INTRA_DC};
    if (cabac_decode_bin(p->cab, INTRA_CHROMA_PRED_MODE)) {
        int idx = cabac_decode_bypass(p->cab) << 1;
        idx |= cabac_decode_bypass(p->cab);
        int mode = mode_list[idx];
        if (mode == col_mode) mode = OV_VDIA;
        c[CU_F_INTRA_C] = mode;
    } else {
        c[CU_F_INTRA_C] = col_mode; /* direct mode */
    }
}

/* ---- transform unit / tree ------------------------------------------ */
static const int8_t *g_cqp_tab; /* [3][cqp_tab_len], set per entry */

static int chroma_qp(Pc *p, int comp, int qp_y)
{
    const EntryParams *e = p->ep;
    int qp_bd = e->qp_bd_offset;
    int base = qp_y < 0 ? 0 : (qp_y > 63 ? 63 : qp_y);
    int mapped = g_cqp_tab[(comp - 1) * e->cqp_tab_len + base + qp_bd];
    int off = comp == 1 ? e->cb_qp_off : (comp == 2 ? e->cr_qp_off : e->jcbcr_qp_off);
    int v = mapped + off;
    if (v < -qp_bd) v = -qp_bd;
    if (v > 63) v = 63;
    return v + qp_bd;
}

/* scan index of (x,y) within the DC 4x4 subblock (up-right diagonal) */
static const uint8_t DIAG44_IDX[4][4] = { /* [y][x] */
    {0, 2, 5, 9}, {1, 4, 8, 12}, {3, 7, 11, 14}, {6, 10, 13, 15},
};

static int nb_coeffs_in_first_sb(int last_x, int last_y)
{
    if ((last_x >> 2) || (last_y >> 2)) return 0xFF;
    return DIAG44_IDX[last_y & 3][last_x & 3];
}

static void maybe_delta_qp(Pc *p, int any_cbf)
{
    const EntryParams *e = p->ep;
    if (!(e->cu_qp_delta_enabled && any_cbf) || p->is_qp_delta_coded)
        return;
    int v = cabac_decode_bin(p->cab, DELTA_QP);
    if (v) {
        while (v < 5 && cabac_decode_bin(p->cab, DELTA_QP + 1))
            v += 1;
        if (v >= 5)
            v += eg_bypass(p);
        if (cabac_decode_bypass(p->cab))
            v = -v;
    }
    p->cu_qp_delta = v;
    p->is_qp_delta_coded = 1;
    int qp_bd = e->qp_bd_offset;
    p->qp = ((p->qp + v + 64 + 2 * qp_bd) % (64 + qp_bd)) - qp_bd;
}

/* info collected by transform_unit for lfnst/mts gating */
typedef struct {
    int cbf_mask;
    int luma_last_x, luma_last_y; uint64_t luma_sig; int has_luma;
    int cb_last_x, cb_last_y; uint64_t cb_sig; int has_cb;
    int cr_last_x, cr_last_y; uint64_t cr_sig; int has_cr;
    int j_last_x, j_last_y; uint64_t j_sig; int has_j;
    int ts_any, ts_luma; /* transform-skip TBs gate LFNST / explicit MTS */
    int valid;
} TuInfo;

/* decode one TB via the native residual decoder straight into coef_buf */
static void code_tb(Pc *p, int64_t tui, int luma, int *last_x, int *last_y,
                    uint64_t *sig)
{
    int32_t *t = tu_rec(p, tui);
    int l2w = t[TU_F_LOG2W], l2h = t[TU_F_LOG2H];
    int n = 1 << (l2w + l2h);
    if (p->ncoef + n > p->coef_cap) bail(p, -6);
    int32_t *dst = p->coef + p->ncoef;
    t[TU_F_COEF] = (int32_t)p->ncoef;
    p->ncoef += n;
    uint64_t sigmap = 0;
    int64_t packed = rc_decode_tb(p->cab, p->lvl_scratch, dst, l2w, l2h,
                                  luma, p->ep->dep_quant, p->ep->sign_hiding,
                                  0, &sigmap);
    *last_x = (int)(packed & 0xFF);
    *last_y = (int)((packed >> 8) & 0xFF);
    *sig = sigmap;
    t[TU_F_LASTX] = *last_x;
    t[TU_F_LASTY] = *last_y;
    t[TU_F_SIGLO] = (int32_t)(sigmap & 0xFFFFFFFFu);
    t[TU_F_SIGHI] = (int32_t)(sigmap >> 32);
}

static int imax(int a, int b) { return a > b ? a : b; }
static int imin(int a, int b) { return a < b ? a : b; }

/* ---- transform-skip residual coding (vcl/residual.py
 * residual_ts_coding :626 reader branch; reference
 * vcl_residual_coding.c residual_coding_ts :3576) ------------------- */

static int ts_rice_c(Pc *p)
{
    int prefix = 0;
    while (prefix < 17 && cabac_decode_bypass(p->cab))
        prefix++;
    if (prefix < 5)
        return (prefix << 1) + (int)cabac_decode_bypass_bits(p->cab, 1);
    int length = 1 + (prefix == 17 ? 14 : prefix - 5);
    int offset = ((1 << (prefix - 5)) + 4) << 1;
    return offset + (int)cabac_decode_bypass_bits(p->cab, length);
}

static void ts_sb_dims(int l2w, int l2h, int *lsw, int *lsh)
{
    if (imin(l2w, l2h) >= 2) { *lsw = 2; *lsh = 2; return; }
    if (l2w + l2h <= 3) { *lsw = imin(l2w, 1); *lsh = imin(l2h, 1); return; }
    if (l2w < 2) { *lsw = l2w; *lsh = 4 - l2w; return; }
    *lsw = 4 - l2h; *lsh = l2h;
}

static void ts_diag_scan(int w, int h, uint8_t *sx, uint8_t *sy)
{
    int i = 0;
    for (int d = 0; d < w + h - 1; d++)
        for (int y = imin(d, h - 1); y >= 0 && d - y < w; y--) {
            sx[i] = (uint8_t)(d - y);
            sy[i] = (uint8_t)y;
            i++;
        }
}

static uint64_t ts_decode_tb(Pc *p, int32_t *out, int l2w, int l2h,
                             int bdpcm)
{
    int w = 1 << l2w, h = 1 << l2h;
    int lsw, lsh;
    ts_sb_dims(l2w, l2h, &lsw, &lsh);
    int sb_w = 1 << lsw, sb_h = 1 << lsh;
    int nb_sb_w = imax(1, w >> lsw), nb_sb_h = imax(1, h >> lsh);
    uint8_t sbx[64], sby[64], inx[16], iny[16];
    ts_diag_scan(nb_sb_w, nb_sb_h, sbx, sby);
    ts_diag_scan(sb_w, sb_h, inx, iny);
    int nb_sb = nb_sb_w * nb_sb_h;
    int max_pos = sb_w * sb_h - 1;

    memset(out, 0, (size_t)w * h * sizeof(*out));
    int budget = ((w * h) << 3) / 4 - (w * h) / 4;
    /* neighbour grids, (h+1) x (w+1), stride W1 (TS max is 32x32) */
    int W1 = w + 1;
    int16_t nb_sig[33 * 33], sign_sum[33 * 33];
    int32_t abs_c[33 * 33];
    memset(nb_sig, 0, sizeof(int16_t) * (size_t)(h + 1) * W1);
    memset(sign_sum, 0, sizeof(int16_t) * (size_t)(h + 1) * W1);
    memset(abs_c, 0, sizeof(int32_t) * (size_t)(h + 1) * W1);

    uint64_t sig_sb_map = 0;

    for (int si = 0; si < nb_sb; si++) {
        int sx = sbx[si], sy = sby[si];
        int flag;
        if (nb_sb == 1) {
            flag = 1;
        } else {
            int abv = sy > 0 && ((sig_sb_map >> (sx + ((sy - 1) << 3))) & 1);
            int lft = sx > 0 && ((sig_sb_map >> ((sx - 1) + (sy << 3))) & 1);
            if (si == nb_sb - 1 && sig_sb_map == 0)
                flag = 1;
            else
                flag = cabac_decode_bin(p->cab,
                                        TS_SIG_COEFF_GROUP + abv + lft);
        }
        if (!flag)
            continue;
        sig_sb_map |= 1ULL << (sx + (sy << 3));

        int base_x = sx << lsw, base_y = sy << lsh;
        int sig_ax[17], sig_ay[17], sig_n = 0;
        int sign_bits[17];
        int p2x[17], p2y[17], n2 = 0;
        int p3x[17], p3y[17], n3 = 0;
        int32_t vmap[16]; /* coded |value| per in-sb scan pos */
        int pos_of[16];   /* scan pos by (local y*sb_w + x) -- unused */
        (void)pos_of;
        memset(vmap, 0, sizeof(vmap));

        int pos = 0;
        while (pos <= max_pos) {
            if (pos < max_pos && budget < 4)
                break;
            if (pos == max_pos && budget < 4)
                break;
            int infer = (pos == max_pos) && sig_n == 0;
            int ax = base_x + inx[pos], ay = base_y + iny[pos];
            int nb = nb_sig[ay * W1 + ax];
            int sig;
            if (infer) {
                sig = 1;
            } else {
                sig = cabac_decode_bin(p->cab, TS_SIG_FLAG + nb);
                budget -= 1;
            }
            if (sig) {
                int nsign = sign_sum[ay * W1 + ax];
                int sign_off = nb != 2 ? nb + nsign
                                       : (nsign == 2 ? 2 : nsign ^ 1);
                int gt1_ctx = nb;
                if (bdpcm) {
                    gt1_ctx = 3;
                    sign_off += 3;
                }
                int sign = cabac_decode_bin(p->cab,
                                            TS_RESIDUAL_SIGN + sign_off);
                int gt1 = cabac_decode_bin(p->cab, TS_LRG1_FLAG + gt1_ctx);
                budget -= 2;
                int value = 1;
                if (gt1) {
                    int par = cabac_decode_bin(p->cab, TS_PAR_FLAG);
                    budget -= 1;
                    value += 1 + par;
                    p2x[n2] = ax; p2y[n2] = ay; n2++;
                }
                vmap[pos] = value;
                sign_bits[sig_n] = sign;
                sig_ax[sig_n] = ax;
                sig_ay[sig_n] = ay;
                sig_n++;
                nb_sig[ay * W1 + ax + 1] += 1;
                nb_sig[(ay + 1) * W1 + ax] += 1;
                sign_sum[ay * W1 + ax + 1] += (int16_t)sign;
                sign_sum[(ay + 1) * W1 + ax] += (int16_t)sign;
                abs_c[(ay + 1) * W1 + ax + 1] = value;
            }
            pos++;
        }

        /* pass 2: gt2..gt5, budget-gated per coefficient */
        int nb_read_pass2 = 0;
        for (int i = 0; i < n2; i++) {
            if (budget < 4)
                break;
            nb_read_pass2++;
            int ax = p2x[i], ay = p2y[i];
            /* recover the scan position of (ax, ay) */
            int sp = -1;
            for (int q = 0; q <= max_pos; q++)
                if (base_x + inx[q] == ax && base_y + iny[q] == ay) {
                    sp = q; break;
                }
            int add = 0;
            for (int g = 1; g <= 4; g++) {
                int gt = cabac_decode_bin(p->cab, TS_GTX_FLAG + g);
                budget -= 1;
                if (!gt)
                    break;
                add += 2;
                if (g == 4) { p3x[n3] = ax; p3y[n3] = ay; n3++; }
            }
            vmap[sp] += add;
            abs_c[(ay + 1) * W1 + ax + 1] = vmap[sp];
        }

        /* pass 3: rice remainders for gt5 coefficients */
        for (int i = 0; i < n3; i++) {
            int ax = p3x[i], ay = p3y[i];
            int sp = -1;
            for (int q = 0; q <= max_pos; q++)
                if (base_x + inx[q] == ax && base_y + iny[q] == ay) {
                    sp = q; break;
                }
            int r = ts_rice_c(p);
            vmap[sp] += 2 * r;
            abs_c[(ay + 1) * W1 + ax + 1] = vmap[sp];
        }

        /* pass-2-skipped coefficients: full remainder as rice */
        for (int i = nb_read_pass2; i < n2; i++) {
            int ax = p2x[i], ay = p2y[i];
            int sp = -1;
            for (int q = 0; q <= max_pos; q++)
                if (base_x + inx[q] == ax && base_y + iny[q] == ay) {
                    sp = q; break;
                }
            int r = ts_rice_c(p);
            vmap[sp] += 2 * r;
            abs_c[(ay + 1) * W1 + ax + 1] = vmap[sp];
        }

        /* level prediction remap (decode side; skipped for BDPCM) */
        for (int i = 0; bdpcm == 0 && i < sig_n; i++) {
            int ax = sig_ax[i], ay = sig_ay[i];
            int sp = -1;
            for (int q = 0; q <= max_pos; q++)
                if (base_x + inx[q] == ax && base_y + iny[q] == ay) {
                    sp = q; break;
                }
            int m = imax(abs_c[ay * W1 + ax + 1], abs_c[(ay + 1) * W1 + ax]);
            int v = vmap[sp];
            if (v == 1 && m)
                v = m;
            else
                v -= (v <= m) ? 1 : 0;
            vmap[sp] = v;
            abs_c[(ay + 1) * W1 + ax + 1] = v;
        }

        /* bypass tail: positions not covered by pass 1 */
        for (int q = pos; q <= max_pos; q++) {
            int ax = base_x + inx[q], ay = base_y + iny[q];
            int v = ts_rice_c(p);
            vmap[q] = v;
            if (v) {
                int sign = cabac_decode_bypass(p->cab);
                sign_bits[sig_n] = sign;
                sig_ax[sig_n] = ax;
                sig_ay[sig_n] = ay;
                sig_n++;
            }
        }

        for (int i = 0; i < sig_n; i++) {
            int ax = sig_ax[i], ay = sig_ay[i];
            int sp = -1;
            for (int q = 0; q <= max_pos; q++)
                if (base_x + inx[q] == ax && base_y + iny[q] == ay) {
                    sp = q; break;
                }
            out[ay * w + ax] = sign_bits[i] ? -vmap[sp] : vmap[sp];
        }
    }
    return sig_sb_map;
}

/* TS residual into coef_buf (transform_unit.py _code_ts_tb) */
static void code_ts_tb(Pc *p, int64_t tui, TuInfo *info, int luma,
                       int bdpcm, int bdpcm_dir)
{
    const EntryParams *e = p->ep;
    int32_t *t = tu_rec(p, tui);
    int l2w = t[TU_F_LOG2W], l2h = t[TU_F_LOG2H];
    int n = 1 << (l2w + l2h);
    if (p->ncoef + n > p->coef_cap) bail(p, -6);
    int32_t *dst = p->coef + p->ncoef;
    t[TU_F_COEF] = (int32_t)p->ncoef;
    p->ncoef += n;
    t[TU_F_TS] = 1;
    t[TU_F_BDPCM] = bdpcm ? (1 | (bdpcm_dir << 1)) : 0;
    t[TU_F_QP] = imax(t[TU_F_QP], 4 + 6 * e->min_qp_prime_ts);
    uint64_t sig = ts_decode_tb(p, dst, l2w, l2h, bdpcm);
    t[TU_F_LASTX] = 0;
    t[TU_F_LASTY] = 0;
    t[TU_F_SIGLO] = (int32_t)(sig & 0xFFFFFFFFu);
    t[TU_F_SIGHI] = (int32_t)(sig >> 32);
    info->ts_any = 1;
    if (luma)
        info->ts_luma = 1;
}

/* transform_skip_flag gate (transform_unit.py _transform_skip_flag;
 * BDPCM and SBT are pre-gated off in the native path) */
static int ts_flag_c(Pc *p, int comp, int l2w, int l2h, int bdpcm)
{
    const EntryParams *e = p->ep;
    if (!e->ts_enabled || l2w > e->log2_ts_max || l2h > e->log2_ts_max)
        return 0;
    if (bdpcm)
        return 1;
    return cabac_decode_bin(p->cab,
                            TRANSFORM_SKIP_FLAG + (comp == 0 ? 0 : 1));
}

/* transform_unit parity (single/shared tree; BDPCM+SBT pre-gated off) */
static void transform_unit_c(Pc *p, int64_t cui, int x0, int y0,
                             int l2w, int l2h, int tr_depth, int root_cbf,
                             TuInfo *info)
{
    const EntryParams *e = p->ep;
    memset(info, 0, sizeof(*info));
    info->valid = 1;

    int has_chroma = e->chroma_enabled; /* tree is SINGLE here */
    int cx = x0 >> 1, cy = y0 >> 1, cl2w = l2w - 1, cl2h = l2h - 1;
    int bdp = cu_rec(p, cui)[CU_F_BDPCM];
    int bd_l = bdp & 1, bd_ld = (bdp >> 1) & 1;
    int bd_c = (bdp >> 2) & 1, bd_cd = (bdp >> 3) & 1;

    int cbf_cb = 0, cbf_cr = 0, joint = 0;
    if (has_chroma) {
        cbf_cb = cabac_decode_bin(p->cab, QT_CBF_CB);
        cbf_cr = cabac_decode_bin(p->cab, QT_CBF_CR + cbf_cb);
    }
    int cbf_mask_c = (cbf_cb << 1) | cbf_cr;

    int cbf_luma = 0;
    if (root_cbf && !cbf_mask_c && !tr_depth)
        cbf_luma = 1;
    else
        cbf_luma = cabac_decode_bin(p->cab, QT_CBF);

    maybe_delta_qp(p, root_cbf | cbf_luma | cbf_mask_c);

    if (e->joint_cbcr && cbf_mask_c)
        joint = cabac_decode_bin(p->cab, JOINT_CB_CR_FLAG + cbf_mask_c - 1);

    info->cbf_mask = cbf_mask_c | (joint << 3) | (cbf_luma << 4);
    int qp_y = p->qp;

    if (cbf_luma) {
        int64_t tui = new_tu(p, 0, x0, y0, l2w, l2h);
        tu_rec(p, tui)[TU_F_QP] = qp_y + e->qp_bd_offset;
        if (ts_flag_c(p, 0, l2w, l2h, bd_l)) {
            code_ts_tb(p, tui, info, 1, bd_l, bd_ld);
            info->luma_last_x = info->luma_last_y = 0;
            uint64_t s = ((uint64_t)(uint32_t)tu_rec(p, tui)[TU_F_SIGHI]
                          << 32) | (uint32_t)tu_rec(p, tui)[TU_F_SIGLO];
            info->luma_sig = s;
        } else {
            code_tb(p, tui, 1, &info->luma_last_x, &info->luma_last_y,
                    &info->luma_sig);
        }
        info->has_luma = 1;
    }

    if (joint) {
        int64_t tui = new_tu(p, 3, cx, cy, cl2w, cl2h);
        int32_t *t = tu_rec(p, tui);
        t[TU_F_JCBCR] = cbf_mask_c;
        t[TU_F_QP] = chroma_qp(p, cbf_mask_c == 3 ? 3 : (cbf_cb ? 1 : 2), qp_y);
        if (ts_flag_c(p, 1, cl2w, cl2h, bd_c)) {
            code_ts_tb(p, tui, info, 0, bd_c, bd_cd);
            info->j_last_x = info->j_last_y = 0;
            t = tu_rec(p, tui);
            info->j_sig = ((uint64_t)(uint32_t)t[TU_F_SIGHI] << 32)
                          | (uint32_t)t[TU_F_SIGLO];
        } else {
            code_tb(p, tui, 0, &info->j_last_x, &info->j_last_y,
                    &info->j_sig);
        }
        info->has_j = 1;
    } else if (cbf_mask_c) {
        if (cbf_cb) {
            int64_t tui = new_tu(p, 1, cx, cy, cl2w, cl2h);
            tu_rec(p, tui)[TU_F_QP] = chroma_qp(p, 1, qp_y);
            if (ts_flag_c(p, 1, cl2w, cl2h, bd_c)) {
                code_ts_tb(p, tui, info, 0, bd_c, bd_cd);
                info->cb_last_x = info->cb_last_y = 0;
                int32_t *t = tu_rec(p, tui);
                info->cb_sig = ((uint64_t)(uint32_t)t[TU_F_SIGHI] << 32)
                               | (uint32_t)t[TU_F_SIGLO];
            } else {
                code_tb(p, tui, 0, &info->cb_last_x, &info->cb_last_y,
                        &info->cb_sig);
            }
            info->has_cb = 1;
        }
        if (cbf_cr) {
            int64_t tui = new_tu(p, 2, cx, cy, cl2w, cl2h);
            tu_rec(p, tui)[TU_F_QP] = chroma_qp(p, 2, qp_y);
            if (ts_flag_c(p, 2, cl2w, cl2h, bd_c)) {
                code_ts_tb(p, tui, info, 0, bd_c, bd_cd);
                info->cr_last_x = info->cr_last_y = 0;
                int32_t *t = tu_rec(p, tui);
                info->cr_sig = ((uint64_t)(uint32_t)t[TU_F_SIGHI] << 32)
                               | (uint32_t)t[TU_F_SIGLO];
            } else {
                code_tb(p, tui, 0, &info->cr_last_x, &info->cr_last_y,
                        &info->cr_sig);
            }
            info->has_cr = 1;
        }
    }
    (void)cui;
}

/* transform_tree_intra parity; returns info validity for lfnst/mts */
static void transform_tree_c(Pc *p, int64_t cui, int x0, int y0,
                             int l2w, int l2h, int tr_depth, int root_cbf,
                             TuInfo *info)
{
    int max_tb = p->ep->l_max_tb; /* single/shared tree */
    int split_v = l2w > max_tb, split_h = l2h > max_tb;
    if (split_v || split_h) {
        info->valid = 0;
        int nl2w = l2w - (split_v ? 1 : 0);
        int nl2h = l2h - (split_h ? 1 : 0);
        TuInfo sub;
        transform_tree_c(p, cui, x0, y0, nl2w, nl2h, tr_depth + 1, root_cbf, &sub);
        if (split_v)
            transform_tree_c(p, cui, x0 + (1 << nl2w), y0, nl2w, nl2h,
                             tr_depth + 1, root_cbf, &sub);
        if (split_h)
            transform_tree_c(p, cui, x0, y0 + (1 << nl2h), nl2w, nl2h,
                             tr_depth + 1, root_cbf, &sub);
        if (split_v && split_h)
            transform_tree_c(p, cui, x0 + (1 << nl2w), y0 + (1 << nl2h),
                             nl2w, nl2h, tr_depth + 1, root_cbf, &sub);
        return;
    }
    transform_unit_c(p, cui, x0, y0, l2w, l2h, tr_depth, root_cbf, info);
}

/* lfnst_mts_idx parity (intra CUs, single tree, no TS/ISP/BDPCM) */
static void lfnst_mts_idx_c(Pc *p, int64_t cui, int l2w, int l2h,
                            const TuInfo *info)
{
    const EntryParams *e = p->ep;
    int32_t *c = cu_rec(p, cui);
    if (!info->valid || !info->cbf_mask)
        return;
    int cbf_mask = info->cbf_mask;

    int can_lfnst = 0;
    if (e->lfnst && !info->ts_any && c[CU_F_PRED] == MODE_INTRA) {
        int mip_ok = !c[CU_F_MIP_FLAG] || (l2w >= 4 && l2h >= 4);
        if (mip_ok) { /* _lfnst_check_st */
            int max_pos_l = (l2w == l2h && l2w <= 3) ? 7 : 15;
            int max_pos_c = (l2w == l2h && l2w <= 4) ? 7 : 15;
            int non_dc = 0, ok = 1;
            if (cbf_mask & 0x10) {
                int nb = nb_coeffs_in_first_sb(info->luma_last_x, info->luma_last_y);
                ok &= info->luma_sig <= 1 && nb <= max_pos_l;
                non_dc |= nb;
            }
            if ((cbf_mask & 0x8) && l2w > 2 && l2h > 2) {
                int nb = nb_coeffs_in_first_sb(info->j_last_x, info->j_last_y);
                ok &= info->j_sig <= 1 && nb <= max_pos_c;
                non_dc |= nb;
            } else {
                if ((cbf_mask & 0x2) && l2w > 2 && l2h > 2) {
                    int nb = nb_coeffs_in_first_sb(info->cb_last_x, info->cb_last_y);
                    ok &= info->cb_sig <= 1 && nb <= max_pos_c;
                    non_dc |= nb;
                }
                if ((cbf_mask & 0x1) && l2w > 2 && l2h > 2) {
                    int nb = nb_coeffs_in_first_sb(info->cr_last_x, info->cr_last_y);
                    ok &= info->cr_sig <= 1 && nb <= max_pos_c;
                    non_dc |= nb;
                }
            }
            can_lfnst = ok && non_dc;
        }
    }

    if (can_lfnst) {
        int idx = 0;
        if (cabac_decode_bin(p->cab, LFNST_IDX)) /* single tree: +0 */
            idx = 1 + cabac_decode_bin(p->cab, LFNST_IDX + 2);
        c[CU_F_LFNST] = idx;
        for (int64_t t = c[CU_F_TU0]; t < p->ntu; t++)
            tu_rec(p, t)[TU_F_LFNST] = idx;
    }

    /* explicit MTS on the luma TB (gated on the luma TB's ts only) */
    if ((cbf_mask & 0x10) && !info->ts_luma) {
        int explicit_on = c[CU_F_PRED] == MODE_INTRA ? e->expl_mts_intra
                                                     : e->expl_mts_inter;
        if (e->mts && explicit_on && !c[CU_F_LFNST]) {
            int lx = info->luma_last_x, ly = info->luma_last_y;
            uint64_t sig = info->luma_sig;
            if (!(lx == 0 && ly == 0) && l2w < 6 && l2h < 6 &&
                !(sig & ~0x000000000F0F0F0FULL)) {
                int idx = 0;
                if (cabac_decode_bin(p->cab, MTS_IDX)) {
                    int sym = cabac_decode_bin(p->cab, MTS_IDX + 1);
                    if (sym && cabac_decode_bin(p->cab, MTS_IDX + 2)) {
                        sym += 1;
                        if (cabac_decode_bin(p->cab, MTS_IDX + 3))
                            sym += 1;
                    }
                    idx = 1 + sym;
                }
                /* store on the luma TU */
                for (int64_t t = c[CU_F_TU0]; t < p->ntu; t++)
                    if (tu_rec(p, t)[TU_F_COMP] == 0) {
                        tu_rec(p, t)[TU_F_MTS] = idx;
                        break;
                    }
            }
        }
    }
}

/* ---- inter MV derivation (drv/inter_mvp.py parity, P path) ---------- */
static MVc mv_change_prec(MVc mv, int src, int dst)
{
    int shift = dst - src;
    if (shift >= 0) {
        mv.x <<= shift;
        mv.y <<= shift;
        return mv;
    }
    shift = -shift;
    int off = 1 << (shift - 1);
    mv.x = mv.x >= 0 ? (mv.x + off - 1) >> shift : (mv.x + off) >> shift;
    mv.y = mv.y >= 0 ? (mv.y + off - 1) >> shift : (mv.y + off) >> shift;
    return mv;
}

static MVc mv_round_prec(MVc mv, int src, int dst)
{
    return mv_change_prec(mv_change_prec(mv, src, dst), dst, src);
}

static int mv_cmp(MVc a, MVc b) { return a.x == b.x && a.y == b.y; }
static int mv_cmp2(MVc a, MVc b)
{
    return a.x == b.x && a.y == b.y && a.ref == b.ref;
}

/* hmvp_update_lut_b parity (drv/inter_mvp.py HmvpLut.update) */
static void hmvp_update_b(Pc *p, MVc mv0, MVc mv1, int inter_dir)
{
    int dup_at = -1;
    for (int i = 0; i < p->hmvp_n && i < 5; i++) {
        if (p->hmvp_dir[i] != inter_dir)
            continue;
        int dup;
        if (inter_dir == 1)
            dup = mv_cmp(mv0, p->hmvp_mv0[i]) && mv0.ref == p->hmvp_mv0[i].ref;
        else if (inter_dir == 2)
            dup = mv_cmp(mv1, p->hmvp_mv1[i]) && mv1.ref == p->hmvp_mv1[i].ref;
        else
            dup = mv_cmp(mv0, p->hmvp_mv0[i]) && mv_cmp(mv1, p->hmvp_mv1[i])
                && mv0.ref == p->hmvp_mv0[i].ref
                && mv1.ref == p->hmvp_mv1[i].ref;
        if (dup) { dup_at = i; break; }
    }
    if (dup_at >= 0) {
        for (int i = dup_at; i < p->hmvp_n - 1; i++) {
            p->hmvp_mv0[i] = p->hmvp_mv0[i + 1];
            p->hmvp_mv1[i] = p->hmvp_mv1[i + 1];
            p->hmvp_dir[i] = p->hmvp_dir[i + 1];
        }
        p->hmvp_n -= 1;
    } else if (p->hmvp_n == 5) {
        for (int i = 0; i < 4; i++) {
            p->hmvp_mv0[i] = p->hmvp_mv0[i + 1];
            p->hmvp_mv1[i] = p->hmvp_mv1[i + 1];
            p->hmvp_dir[i] = p->hmvp_dir[i + 1];
        }
        p->hmvp_n = 4;
    }
    p->hmvp_mv0[p->hmvp_n] = mv0;
    p->hmvp_mv1[p->hmvp_n] = mv1;
    p->hmvp_dir[p->hmvp_n++] = (uint8_t)inter_dir;
}

static int iavail(const Pc *p, int lst, int ux, int uy)
{
    if (ux < 0 || uy < 0 || ux >= p->uw || uy >= p->uh) return 0;
    return (lst ? p->dir1 : p->dir0)[uy * p->uw + ux];
}

static MVc imv_at(const Pc *p, int lst, int ux, int uy)
{
    return (lst ? p->mv1 : p->mv0)[uy * p->uw + ux];
}

static void ifill(Pc *p, int lst, MVc mv, int ux, int uy, int nw, int nh)
{
    uint8_t *d = lst ? p->dir1 : p->dir0;
    MVc *m = lst ? p->mv1 : p->mv0;
    if (ux + nw > p->uw) nw = p->uw - ux;
    if (uy + nh > p->uh) nh = p->uh - uy;
    for (int j = 0; j < nh; j++)
        for (int i = 0; i < nw; i++) {
            d[(uy + j) * p->uw + (ux + i)] = 1;
            m[(uy + j) * p->uw + (ux + i)] = mv;
        }
}

static void ifill_tmvp(Pc *p, int lst, MVc mv, int ux, int uy, int nw, int nh)
{
    mv.bcw = 0;
    mv.prec = 0;
    int32_t *t = lst ? p->tmv1 : p->tmv0;
    int sx = ux & 1, sy = uy & 1;
    int x0 = (ux + sx) >> 1, y0 = (uy + sy) >> 1;
    int nj = (nh + (1 - sy)) >> 1, ni = (nw + (1 - sx)) >> 1;
    for (int j = 0; j < nj; j++)
        for (int i = 0; i < ni; i++) {
            int32_t *cell = t + ((y0 + j) * p->uw8 + (x0 + i)) * 3;
            cell[0] = mv.x;
            cell[1] = mv.y;
            cell[2] = mv.ref;
        }
}

/* P-path update (update_mv_ctx :1454) */
static void update_mv_ctx(Pc *p, MVc mv, int ux, int uy, int nw, int nh)
{
    ifill(p, 0, mv, ux, uy, nw, nh);
    ifill_tmvp(p, 0, mv, ux, uy, nw, nh);
    hmvp_update_b(p, mv, mv, 1);
}

/* B-path update (update_mv_ctx_b) */
static void update_mv_ctx_b(Pc *p, MVc mv0, MVc mv1, int ux, int uy, int nw,
                            int nh, int inter_dir)
{
    if (inter_dir & 1) {
        ifill(p, 0, mv0, ux, uy, nw, nh);
        ifill_tmvp(p, 0, mv0, ux, uy, nw, nh);
    }
    if (inter_dir & 2) {
        ifill(p, 1, mv1, ux, uy, nw, nh);
        ifill_tmvp(p, 1, mv1, ux, uy, nw, nh);
    }
    hmvp_update_b(p, mv0, mv1, inter_dir);
}

/* MergeInfo (both lists) */
typedef struct { int dir; MVc mv0, mv1; } MIc;

static MIc mi_at(const Pc *p, int ux, int uy)
{
    MIc mi;
    int d0 = iavail(p, 0, ux, uy), d1 = iavail(p, 1, ux, uy);
    mi.dir = d0 | (d1 << 1);
    mi.mv0 = p->mv0[uy * p->uw + ux]; /* zero-init when never filled */
    mi.mv1 = p->mv1[uy * p->uw + ux];
    return mi;
}

static int mi_cmp_c(MIc a, MIc b)
{
    if (a.dir != b.dir) return 0;
    if ((a.dir & 1) && !(mv_cmp(a.mv0, b.mv0) && a.mv0.ref == b.mv0.ref))
        return 0;
    if ((a.dir & 2) && !(mv_cmp(a.mv1, b.mv1) && a.mv1.ref == b.mv1.ref))
        return 0;
    return 1;
}

static MVc avg_mv_pair(MVc a, MVc b)
{
    int x = a.x + b.x, y = a.y + b.y;
    x += 1 - (x >= 0);
    y += 1 - (y >= 0);
    MVc o = a;
    o.x = x >> 1;
    o.y = y >> 1;
    return o;
}

/* ---- TMVP (drv/inter_mvp.py _col_avail/_tmvp_scaled etc.;
 * reference: drv_mvp.c load_ctb_tmvp/derive_tmvp_cand :297-540) -------- */

#define MV_MAX_ ((1 << 17) - 1)
#define MV_MIN_ (-(1 << 17))

/* tmvp_round_mv parity (:119): mantissa/exponent MV compression */
static int tmvp_round_mv(int val)
{
    int sign = val < 0 ? -1 : 0;
    if (((val ^ sign) - (sign ? 1 : 0)) > 31) {
        unsigned bits = (unsigned)((val ^ sign) | 31);
        int scale = (31 - __builtin_clz(bits)) - 5;
        int rnd = (1 << scale) >> 1;
        int n = (val + rnd) >> scale;
        int exponent = scale + ((n ^ sign) >> 5);
        int mantissa = (n & 31) | (sign << 5);
        return (mantissa ^ 32) << (exponent - (exponent ? 1 : 0));
    }
    return val;
}

static int trunc_div_c(int a, int b)
{
    int q = abs(a) / abs(b);
    return ((a < 0) != (b < 0)) ? -q : q;
}

static int derive_tmvp_scale(int dist_ref, int dist_col)
{
    if (dist_ref == dist_col || !dist_col)
        return 256;
    if (dist_ref < -128) dist_ref = -128;
    if (dist_ref > 127) dist_ref = 127;
    if (dist_col < -128) dist_col = -128;
    if (dist_col > 127) dist_col = 127;
    int scale = dist_ref * trunc_div_c(0x4000 + abs(dist_col >> 1), dist_col);
    scale += 32;
    scale >>= 6;
    if (scale < -4096) scale = -4096;
    if (scale > 4095) scale = 4095;
    return scale;
}

static int tmvp_scale_one(int scale, int v)
{
    int64_t pv = (int64_t)scale * v;
    int r = (int)((pv + 128 - (pv >= 0 ? 1 : 0)) >> 8);
    if (r < MV_MIN_) r = MV_MIN_;
    if (r > MV_MAX_) r = MV_MAX_;
    return r;
}

static int col_avail(const Pc *p, int lst, int cx, int cy, int cu_uy,
                     int cu_ux)
{
    const EntryParams *e = p->ep;
    if (!e->tmvp_enabled)
        return 0;
    int sh = e->log2_ctb - 2;
    if ((cy >> sh) != (cu_uy >> sh))
        return 0;
    if ((cx >> sh) > (cu_ux >> sh) + 1 ||
        (cx - ((cu_ux >> sh) << sh)) > (1 << sh))
        return 0;
    const uint8_t *dir_m = lst ? p->col_dir1 : p->col_dir0;
    int px = cx + (e->tile_x0 >> 2), py = cy + (e->tile_y0 >> 2);
    if (py < 0 || px < 0 || py >= e->col_uh || px >= e->col_uw)
        return 0;
    return dir_m[py * e->col_uw + px];
}

static MVc tmvp_scaled(const Pc *p, int lst_cur, int ref_idx, int col_lst,
                       int cx, int cy, int prec_amvr /* -1 = none */)
{
    const EntryParams *e = p->ep;
    int px = (cx + (e->tile_x0 >> 2)) >> 1;
    int py = (cy + (e->tile_y0 >> 2)) >> 1;
    const int32_t *cell = (col_lst ? p->col_mv1 : p->col_mv0)
                          + (py * e->col_uw8 + px) * 3;
    int dist_col = (col_lst ? e->dist_col1 : e->dist_col0)[cell[2]];
    int dist_ref = (lst_cur ? e->dist_ref1 : e->dist_ref0)[ref_idx];
    int scale = derive_tmvp_scale(dist_ref, dist_col);
    MVc out;
    out.x = tmvp_scale_one(scale, tmvp_round_mv(cell[0]));
    out.y = tmvp_scale_one(scale, tmvp_round_mv(cell[1]));
    if (prec_amvr >= 0)
        out = mv_round_prec(out, PREC_INTERNAL, prec_amvr);
    out.ref = (int8_t)ref_idx;
    out.bcw = 0;
    out.prec = 0;
    return out;
}

/* derive_tmvp_cand parity (:403) */
static int derive_tmvp_amvp(const Pc *p, int lst, int ref_idx, int ux,
                            int uy, int nw, int nh, int prec_amvr, MVc *out)
{
    int c1x = (ux + (nw >> 1)) & ~1, c1y = (uy + (nh >> 1)) & ~1;
    int c0x = (ux + nw) & ~1, c0y = (uy + nh) & ~1;
    int a_c0 = col_avail(p, 0, c0x, c0y, uy, ux);
    int a_c01 = col_avail(p, 1, c0x, c0y, uy, ux);
    int a_c1 = col_avail(p, 0, c1x, c1y, uy, ux);
    int a_c11 = col_avail(p, 1, c1x, c1y, uy, ux);
    int av[4], cl[4], px[4], py[4];
    /* drv_mvp.c :431-433: plane-0-first iff (!col_ref_l0 && !ldc) ||
     * (ldc && lst == 0) */
    if ((!p->ep->col_ref_l0 && !p->ep->tmvp_ldc)
        || (p->ep->tmvp_ldc && lst == 0)) {
        av[0] = a_c0;  cl[0] = 0; px[0] = c0x; py[0] = c0y;
        av[1] = a_c01; cl[1] = 1; px[1] = c0x; py[1] = c0y;
        av[2] = a_c1;  cl[2] = 0; px[2] = c1x; py[2] = c1y;
        av[3] = a_c11; cl[3] = 1; px[3] = c1x; py[3] = c1y;
    } else {
        av[0] = a_c01; cl[0] = 1; px[0] = c0x; py[0] = c0y;
        av[1] = a_c0;  cl[1] = 0; px[1] = c0x; py[1] = c0y;
        av[2] = a_c11; cl[2] = 1; px[2] = c1x; py[2] = c1y;
        av[3] = a_c1;  cl[3] = 0; px[3] = c1x; py[3] = c1y;
    }
    for (int i = 0; i < 4; i++)
        if (av[i]) {
            *out = tmvp_scaled(p, lst, ref_idx, cl[i], px[i], py[i],
                               prec_amvr);
            return 1;
        }
    return 0;
}

/* vvc_derive_merge_mvp TMVP candidate, P path (:760) */
static int derive_tmvp_merge_p(const Pc *p, int ux, int uy, int nw, int nh,
                               MVc *out)
{
    int c1x = (ux + (nw >> 1)) & ~1, c1y = (uy + (nh >> 1)) & ~1;
    int c0x = (ux + nw) & ~1, c0y = (uy + nh) & ~1;
    int av[4] = {col_avail(p, 0, c0x, c0y, uy, ux),
                 col_avail(p, 1, c0x, c0y, uy, ux),
                 col_avail(p, 0, c1x, c1y, uy, ux),
                 col_avail(p, 1, c1x, c1y, uy, ux)};
    int cl[4] = {0, 1, 0, 1};
    int px[4] = {c0x, c0x, c1x, c1x};
    int py[4] = {c0y, c0y, c1y, c1y};
    for (int i = 0; i < 4; i++)
        if (av[i]) {
            *out = tmvp_scaled(p, 0, 0, cl[i], px[i], py[i], -1);
            out->ref = 0;
            return 1;
        }
    return 0;
}

/* vvc_derive_merge_mvp (P path, TMVP pre-gated off) */
static MVc derive_merge_mvp(Pc *p, int ux, int uy, int nw, int nh,
                            int merge_idx, int max_nb_cand, int is_small)
{
    MVc cand[8];
    int ncand = 0;
    MVc amvp[5];
    int have[5] = {0, 0, 0, 0, 0};

    int got_t = iavail(p, 0, ux + nw - 1, uy - 1);
    int got_l = iavail(p, 0, ux - 1, uy + nh - 1);

    if (got_t) { /* B1 */
        MVc mv = imv_at(p, 0, ux + nw - 1, uy - 1);
        amvp[0] = mv; have[0] = 1;
        cand[ncand++] = mv;
        if (ncand - 1 == merge_idx) return mv;
    }
    if (got_l) { /* A1 */
        MVc mv = imv_at(p, 0, ux - 1, uy + nh - 1);
        amvp[1] = mv; have[1] = 1;
        if (!got_t || !mv_cmp2(mv, amvp[0])) {
            cand[ncand++] = mv;
            if (ncand - 1 == merge_idx) return mv;
        }
    }
    if (iavail(p, 0, ux + nw, uy - 1)) { /* B0 */
        MVc mv = imv_at(p, 0, ux + nw, uy - 1);
        if (!got_t || !mv_cmp2(mv, amvp[0])) {
            cand[ncand++] = mv;
            if (ncand - 1 == merge_idx) return mv;
        }
    }
    if (iavail(p, 0, ux - 1, uy + nh)) { /* A0 */
        MVc mv = imv_at(p, 0, ux - 1, uy + nh);
        if (!got_l || !mv_cmp2(mv, amvp[1])) {
            cand[ncand++] = mv;
            if (ncand - 1 == merge_idx) return mv;
        }
    }
    if (ncand < 4 && iavail(p, 0, ux - 1, uy - 1)) { /* B2 */
        MVc mv = imv_at(p, 0, ux - 1, uy - 1);
        if ((!got_l || !mv_cmp2(mv, amvp[1])) &&
            (!got_t || !mv_cmp2(mv, amvp[0]))) {
            cand[ncand++] = mv;
            if (ncand - 1 == merge_idx) return mv;
        }
    }

    if (p->ep->tmvp_enabled && !is_small) {
        MVc t;
        if (derive_tmvp_merge_p(p, ux, uy, nw, nh, &t)) {
            cand[ncand++] = t;
            if (ncand - 1 == merge_idx) return t;
        }
    }

    /* HMVP (hmvp_add_merge_cand parity): newest-first, list-0 entries */
    if (ncand != max_nb_cand - 1) {
        for (int i = 1; i <= p->hmvp_n; i++) {
            int idx = p->hmvp_n - i;
            if (!(p->hmvp_dir[idx] & 1))
                continue;
            MVc mv = p->hmvp_mv0[idx];
            if (i > 2 || ((!got_t || !mv_cmp2(mv, amvp[0])) &&
                          (!got_l || !mv_cmp2(mv, amvp[1])))) {
                cand[ncand++] = mv;
                if (ncand == merge_idx + 1)
                    return cand[ncand - 1];
                if (ncand == max_nb_cand - 1)
                    break;
            }
        }
    }

    if (ncand > 1 && ncand < max_nb_cand) { /* pairwise average */
        MVc a = cand[0], b = cand[1];
        int ax = a.x + b.x, ay = a.y + b.y;
        ax += 1 - (ax >= 0);
        ay += 1 - (ay >= 0);
        MVc avg = a;
        avg.x = ax >> 1;
        avg.y = ay >> 1;
        if (a.prec != b.prec) avg.prec = 0;
        if (ncand == merge_idx) return avg;
        cand[ncand++] = avg;
    }

    int diff = merge_idx - ncand;
    int ref_idx = diff <= p->ep->nb_active_ref0 - 1 ? diff : 0;
    while (ncand < max_nb_cand) {
        MVc z = {0, 0, (int8_t)ref_idx, 0, 0};
        cand[ncand++] = z;
    }
    return cand[ncand - 1];
}

/* derive_mvp_candidates_1 parity (per list; opp-list fallback via
 * rpl0/1_opp; TMVP pre-gated off) */
static MVc derive_mvp_cand(Pc *p, int lst, int ref_idx, int ux, int uy,
                           int nw, int nh, int mvp_idx, int inter_dir_bit,
                           int prec_amvr, int is_small)
{
    MVc cand[4];
    int ncand = 0;
    int opp = (lst ? p->ep->rpl1_opp : p->ep->rpl0_opp)[ref_idx];
    int olst = 1 - lst;

    /* A0 then A1 (left), B0/B1/B2 (above): same-list same-ref first,
     * else opposite-list opposite-ref */
#define PROBE(px, py) \
    ((iavail(p, lst, px, py) && imv_at(p, lst, px, py).ref == ref_idx) \
         ? (cand[ncand++] = imv_at(p, lst, px, py), 1) \
     : (iavail(p, olst, px, py) && imv_at(p, olst, px, py).ref == opp) \
         ? (cand[ncand++] = imv_at(p, olst, px, py), 1) : 0)
    if (!PROBE(ux - 1, uy + nh))
        PROBE(ux - 1, uy + nh - 1);
    if (!PROBE(ux + nw, uy - 1))
        if (!PROBE(ux + nw - 1, uy - 1))
            PROBE(ux - 1, uy - 1);
#undef PROBE

    for (int i = 0; i < ncand; i++)
        cand[i] = mv_round_prec(cand[i], PREC_INTERNAL, prec_amvr);
    if (ncand == 2 && mv_cmp(cand[0], cand[1]))
        ncand = 1;

    if (p->ep->tmvp_enabled && ncand < 2 && !is_small) {
        MVc t;
        if (derive_tmvp_amvp(p, lst, ref_idx, ux, uy, nw, nh, prec_amvr, &t))
            cand[ncand++] = t;
    }

    if (ncand < 2) { /* hmvp_add_cand_1: oldest-first, same-dir then opp */
        for (int i = 0; i < p->hmvp_n && i < 4 && ncand < 2; i++) {
            if (p->hmvp_dir[i] & inter_dir_bit) {
                MVc c = (inter_dir_bit & 1) ? p->hmvp_mv0[i] : p->hmvp_mv1[i];
                if (c.ref == ref_idx)
                    cand[ncand++] = c;
            }
            if (ncand >= 2)
                break;
            if (p->hmvp_dir[i] & (3 - inter_dir_bit)) {
                MVc c = ((3 - inter_dir_bit) & 1) ? p->hmvp_mv0[i]
                                                  : p->hmvp_mv1[i];
                if (c.ref == opp)
                    cand[ncand++] = c;
            }
        }
    }
    while (ncand < 2) {
        MVc z = {0, 0, (int8_t)ref_idx, 0, 0};
        cand[ncand++] = z;
    }
    for (int i = 0; i < 2; i++)
        cand[i] = mv_round_prec(cand[i], PREC_INTERNAL, prec_amvr);
    return cand[mvp_idx];
}

/* derive_merge_mvp_b parity (drv/inter_mvp.py :541) */
static MIc derive_merge_mvp_b(Pc *p, int ux, int uy, int nw, int nh,
                              int merge_idx, int max_nb_cand, int is_small)
{
    MIc cand[8];
    int ncand = 0;
    MIc amvp[5];
    int have[5] = {0, 0, 0, 0, 0};
    memset(amvp, 0, sizeof(amvp));
    for (int i = 0; i < 5; i++) amvp[i].dir = 3;

    int got_t = iavail(p, 0, ux + nw - 1, uy - 1)
                || iavail(p, 1, ux + nw - 1, uy - 1);
    int got_l = iavail(p, 0, ux - 1, uy + nh - 1)
                || iavail(p, 1, ux - 1, uy + nh - 1);

    if (got_t) { /* B1 */
        MIc mi = mi_at(p, ux + nw - 1, uy - 1);
        amvp[0] = mi; have[0] = 1;
        cand[ncand++] = mi;
        if (ncand - 1 == merge_idx) return mi;
    }
    if (got_l) { /* A1 */
        MIc mi = mi_at(p, ux - 1, uy + nh - 1);
        amvp[1] = mi; have[1] = 1;
        if (!got_t || !mi_cmp_c(mi, amvp[0])) {
            cand[ncand++] = mi;
            if (ncand - 1 == merge_idx) return mi;
        }
    }
    if (iavail(p, 0, ux + nw, uy - 1) || iavail(p, 1, ux + nw, uy - 1)) {
        MIc mi = mi_at(p, ux + nw, uy - 1); /* B0 */
        if (!got_t || !mi_cmp_c(mi, amvp[0])) {
            cand[ncand++] = mi;
            if (ncand - 1 == merge_idx) return mi;
        }
    }
    if (iavail(p, 0, ux - 1, uy + nh) || iavail(p, 1, ux - 1, uy + nh)) {
        MIc mi = mi_at(p, ux - 1, uy + nh); /* A0 */
        if (!got_l || !mi_cmp_c(mi, amvp[1])) {
            cand[ncand++] = mi;
            if (ncand - 1 == merge_idx) return mi;
        }
    }
    if (ncand < 4 && (iavail(p, 0, ux - 1, uy - 1)
                      || iavail(p, 1, ux - 1, uy - 1))) {
        MIc mi = mi_at(p, ux - 1, uy - 1); /* B2 */
        if ((!got_l || !mi_cmp_c(mi, amvp[1])) &&
            (!got_t || !mi_cmp_c(mi, amvp[0]))) {
            cand[ncand++] = mi;
            if (ncand - 1 == merge_idx) return mi;
        }
    }
    (void)have;

    if (p->ep->tmvp_enabled && !is_small) {
        /* vvc_derive_merge_mvp_b TMVP: bi candidate from c0 (both-plane
         * aware) else c1 */
        int c1x = (ux + (nw >> 1)) & ~1, c1y = (uy + (nh >> 1)) & ~1;
        int c0x = (ux + nw) & ~1, c0y = (uy + nh) & ~1;
        int a00 = col_avail(p, 0, c0x, c0y, uy, ux);
        int a01 = col_avail(p, 1, c0x, c0y, uy, ux);
        int a10 = col_avail(p, 0, c1x, c1y, uy, ux);
        int a11 = col_avail(p, 1, c1x, c1y, uy, ux);
        int pick = (a00 || a01) ? 0 : ((a10 || a11) ? 1 : -1);
        if (pick >= 0) {
            int a0 = pick ? a10 : a00, a1 = pick ? a11 : a01;
            int cx = pick ? c1x : c0x, cy = pick ? c1y : c0y;
            MIc t;
            t.dir = 3;
            if (!p->ep->col_ref_l0) {
                if (a0) {
                    t.mv0 = tmvp_scaled(p, 0, 0, 0, cx, cy, -1);
                    t.mv1 = (a1 && p->ep->tmvp_ldc)
                                ? tmvp_scaled(p, 1, 0, 1, cx, cy, -1)
                                : tmvp_scaled(p, 1, 0, 0, cx, cy, -1);
                } else {
                    t.mv0 = tmvp_scaled(p, 0, 0, 1, cx, cy, -1);
                    t.mv1 = tmvp_scaled(p, 1, 0, 1, cx, cy, -1);
                }
            } else {
                if (a1) {
                    t.mv1 = tmvp_scaled(p, 1, 0, 1, cx, cy, -1);
                    t.mv0 = (a0 && p->ep->tmvp_ldc)
                                ? tmvp_scaled(p, 0, 0, 0, cx, cy, -1)
                                : tmvp_scaled(p, 0, 0, 1, cx, cy, -1);
                } else {
                    t.mv0 = tmvp_scaled(p, 0, 0, 0, cx, cy, -1);
                    t.mv1 = tmvp_scaled(p, 1, 0, 0, cx, cy, -1);
                }
            }
            cand[ncand++] = t;
            if (ncand - 1 == merge_idx) return t;
        }
    }

    if (ncand != max_nb_cand - 1) { /* HMVP, newest-first */
        for (int i = 1; i <= p->hmvp_n; i++) {
            int idx = p->hmvp_n - i;
            MIc mi;
            mi.dir = p->hmvp_dir[idx];
            mi.mv0 = p->hmvp_mv0[idx];
            mi.mv1 = p->hmvp_mv1[idx];
            if (i > 2 || ((!got_t || !mi_cmp_c(mi, amvp[0])) &&
                          (!got_l || !mi_cmp_c(mi, amvp[1])))) {
                cand[ncand++] = mi;
                if (ncand == merge_idx + 1)
                    return cand[ncand - 1];
                if (ncand == max_nb_cand - 1)
                    break;
            }
        }
    }

    if (ncand > 1 && ncand < max_nb_cand) { /* pairwise average */
        MIc a = cand[0], b = cand[1];
        int inter_dir = a.dir & b.dir;
        MVc mv0 = a.mv0, mv1 = a.mv1;
        if (inter_dir & 1) {
            mv0 = avg_mv_pair(a.mv0, b.mv0);
        } else if (b.dir & 1) {
            mv0 = b.mv0;
            inter_dir |= 1;
        } else if (a.dir & 1) {
            inter_dir |= 1;
        }
        if (inter_dir & 2) {
            mv1 = avg_mv_pair(a.mv1, b.mv1);
        } else if (b.dir & 2) {
            mv1 = b.mv1;
            inter_dir |= 2;
        } else if (a.dir & 2) {
            inter_dir |= 2;
        }
        if (ncand == merge_idx) {
            int pa = (a.dir & 1) ? a.mv0.prec : a.mv1.prec;
            int pb = (b.dir & 1) ? b.mv0.prec : b.mv1.prec;
            int prec = pa == pb ? pa : 0;
            mv0.prec = (int8_t)prec; mv0.bcw = 0;
            mv1.prec = (int8_t)prec; mv1.bcw = 0;
            MIc out = {inter_dir, mv0, mv1};
            return out;
        }
        ncand++; /* placeholder: C increments without storing */
    }

    int diff = merge_idx - ncand;
    int nmin = p->ep->nb_active_ref0 < p->ep->nb_active_ref1
                   ? p->ep->nb_active_ref0 : p->ep->nb_active_ref1;
    int ridx = diff <= nmin - 1 ? diff : 0;
    MVc z = {0, 0, (int8_t)ridx, 0, 0};
    MIc out = {3, z, z};
    return out;
}

/* ---- inter PU syntax (vcl/inter_pu.py parity, P subset) ------------- */
static int code_merge_idx(Pc *p, int max_nb_cand)
{
    if (max_nb_cand <= 1) return 0;
    int v = 0;
    if (cabac_decode_bin(p->cab, MERGE_IDX)) {
        v = 1;
        while (v < max_nb_cand - 1 && cabac_decode_bypass(p->cab))
            v += 1;
    }
    return v;
}

static void code_mvd(Pc *p, int *mx, int *my)
{
    int abs_x = cabac_decode_bin(p->cab, MVD);
    int abs_y = cabac_decode_bin(p->cab, MVD);
    if (abs_x) abs_x += cabac_decode_bin(p->cab, MVD + 1);
    if (abs_y) abs_y += cabac_decode_bin(p->cab, MVD + 1);
    if (abs_x) {
        if (abs_x > 1) abs_x += exp_golomb_mv(p);
        if (cabac_decode_bypass(p->cab)) abs_x = -abs_x;
    }
    if (abs_y) {
        if (abs_y > 1) abs_y += exp_golomb_mv(p);
        if (cabac_decode_bypass(p->cab)) abs_y = -abs_y;
    }
    *mx = abs_x;
    *my = abs_y;
}

static int code_ref_idx(Pc *p, int nb_active)
{
    int v = 0;
    if (cabac_decode_bin(p->cab, REF_PIC)) {
        v = 1;
        if (nb_active > 2 && cabac_decode_bin(p->cab, REF_PIC + 1)) {
            v = 2;
            while (nb_active > v + 1 && cabac_decode_bypass(p->cab))
                v += 1;
        }
    }
    return v;
}

static int code_amvr_precision(Pc *p)
{
    static const int order[4] = {PREC_QUARTER, PREC_INT, PREC_4PEL, PREC_HALF};
    if (!cabac_decode_bin(p->cab, IMV_FLAG))
        return order[0];
    if (cabac_decode_bin(p->cab, IMV_FLAG + 4))
        return order[1 + cabac_decode_bin(p->cab, IMV_FLAG + 1)];
    return order[3];
}

/* ovcabac_read_ae_mmvd_merge_idx parity (vcl/inter_pu.py :209): base
 * (ctx bin), step (TU: ctx bin + bypass run), direction (2 bypass) */
static int code_mmvd_merge_idx(Pc *p, int max_nb_cand)
{
    int var0 = 0, var1 = 0, var2;
    if (max_nb_cand > 1)
        var0 = cabac_decode_bin(p->cab, MMVD_MERGE_IDX);
    if (cabac_decode_bin(p->cab, MMVD_STEP_MVP_IDX)) {
        var1 = 1;
        while (var1 < 7 && cabac_decode_bypass(p->cab))
            var1++;
    }
    var2 = cabac_decode_bypass(p->cab) ? 2 : 0;
    var2 += cabac_decode_bypass(p->cab);
    return var0 * 32 + var1 * 4 + var2;
}

/* ovcabac_read_ae_bcw_flag/_idx parity (vcl/inter_pu.py code_bcw_idx).
 * Returns bcw_idx (2 = BCW_DEFAULT). */
static int code_bcw_idx(Pc *p)
{
    static const int order[5] = {2, 3, 1, 4, 0}; /* parsing_order[BCW_NUM] */
    int nb_bits = (p->ep->ldc ? 5 : 3) - 2;
    if (!cabac_decode_bin(p->cab, BCW_IDX))
        return 2;
    int k = 1;
    for (int i = 0; i < nb_bits; i++) {
        if (!cabac_decode_bypass(p->cab))
            break;
        k++;
    }
    return order[k];
}

/* BCW idx read gate (read_bidir_mvp :2380): sps flag + size >= 256 */
static int maybe_bcw(Pc *p, int l2w, int l2h)
{
    if (p->ep->bcw_enabled && l2w + l2h >= 8)
        return code_bcw_idx(p);
    return 2;
}

/* ---- MMVD offset derivation (drv/inter_mvp.py :705-770) ------------- */
static void mmvd_offset_c(int idx, int shift, int *dx, int *dy)
{
    static const int steps[8] = {1, 2, 4, 8, 16, 32, 64, 128};
    int off = (steps[idx >> 2] << 2) << shift;
    int f = idx & 3;
    *dx = f == 0 ? off : (f == 1 ? -off : 0);
    *dy = f == 2 ? off : (f == 3 ? -off : 0);
}

/* drv_mmvd_merge_mvp_p parity (:722) */
static MVc drv_mmvd_p(Pc *p, int ux, int uy, int nw, int nh, int merge_idx,
                      int is_small)
{
    const EntryParams *e = p->ep;
    int base = merge_idx / 32;
    MVc mv = derive_merge_mvp(p, ux, uy, nw, nh, base, e->max_num_merge_cand,
                              is_small);
    int idx = merge_idx % 64 % 32;
    int dx, dy;
    mmvd_offset_c(idx, e->mmvd_shift, &dx, &dy);
    mv.x += dx;
    mv.y += dy;
    update_mv_ctx(p, mv, ux, uy, nw, nh);
    return mv;
}

/* CIIP blend weight from the top-right-above / bottom-left-left CU types
 * (vcl/inter_pu.py _derive_ciip_wt; rcn_inter.c rcn_ciip_weighted_sum) */
static int derive_ciip_wt(Pc *p, int x0, int y0, int l2w, int l2h)
{
    int x_r = x0 + (1 << l2w) - 1;
    int y_b = y0 + (1 << l2h) - 1;
    int abv = nbr_u8(p, p->m_ctype, x_r, y0 - 1, CU_NA);
    int lft = nbr_u8(p, p->m_ctype, x0 - 1, y_b, CU_NA);
    return 1 + (abv == CU_INTRA || abv == CU_MIP)
             + (lft == CU_INTRA || lft == CU_MIP);
}

/* merge_data_p/b tool-flag header (vcl/inter_pu.py merge_data_p :383).
 * Returns a bitmask: 1 = mmvd, 2 = ciip, 4 = gpm (gpm pre-gated off). */
static int merge_data_flags(Pc *p, int l2w, int l2h, int skip)
{
    const EntryParams *e = p->ep;
    int gpm_ok = e->slice_type == 0 && e->gpm_enabled && e->max_gpm_cand > 1
                 && l2w > 2 && l2h > 2 && l2w < 7 && l2h < 7
                 && l2w < 3 + l2h && l2h < 3 + l2w;
    int mmvd = 0, ciip = 0, gpm = 0;
    if (!skip) {
        int ciip_ok = e->ciip_enabled && l2w < 7 && l2h < 7
                      && (l2w + l2h) >= 6;
        int reg = 1;
        if (ciip_ok || gpm_ok)
            reg = cabac_decode_bin(p->cab, REGULAR_MERGE_FLAG + 1);
        if (reg) {
            if (e->mmvd_enabled)
                mmvd = cabac_decode_bin(p->cab, MMVD_FLAG);
        } else {
            ciip = ciip_ok;
            if (gpm_ok && ciip_ok)
                ciip = cabac_decode_bin(p->cab, CIIP_FLAG);
            gpm = !ciip;
        }
    } else {
        int reg = 1;
        if (gpm_ok)
            reg = cabac_decode_bin(p->cab, REGULAR_MERGE_FLAG);
        if (reg) {
            if (e->mmvd_enabled)
                mmvd = cabac_decode_bin(p->cab, MMVD_FLAG);
        } else {
            gpm = 1;
        }
    }
    return mmvd | (ciip << 1) | (gpm << 2);
}

/* ovcabac_read_ae_gpm_merge_idx parity (vcl/inter_pu.py :244) */
static void code_gpm_merge_idx(Pc *p, int *split_dir, int *idx0, int *idx1)
{
    const EntryParams *e = p->ep;
    *split_dir = truncated_binary(p, 63);
    int n2 = e->max_gpm_cand - 2;
    int i0 = 0;
    if (cabac_decode_bin(p->cab, MERGE_IDX)) {
        int m = n2;
        for (int k = 0; k < n2; k++)
            if (!cabac_decode_bypass(p->cab)) { m = k; break; }
        i0 = m + 1;
    }
    int i1 = 0;
    if (n2 > 0 && cabac_decode_bin(p->cab, MERGE_IDX)) {
        int m = n2 - 1;
        for (int k = 0; k < n2 - 1; k++)
            if (!cabac_decode_bypass(p->cab)) { m = k; break; }
        i1 = m + 1;
    }
    i1 += i1 >= i0 ? 1 : 0;
    *idx0 = i0;
    *idx1 = i1;
}

/* drv_gpm_merge_mvp_b parity (drv/gpm.py :96): partition MV selection by
 * merge-idx parity + per-4x4 storage/TMVP fills (no HMVP update) */
static void drv_gpm_b(Pc *p, int ux, int uy, int nw, int nh, int split_dir,
                      int idx0, int idx1, int *d0_o, MVc *m0_o, int *d1_o,
                      MVc *m1_o)
{
    const EntryParams *e = p->ep;
    MIc mi0 = derive_merge_mvp_b(p, ux, uy, nw, nh, idx0,
                                 e->max_num_merge_cand, 0);
    MIc mi1 = idx1 == idx0 ? mi0
                           : derive_merge_mvp_b(p, ux, uy, nw, nh, idx1,
                                                e->max_num_merge_cand, 0);
    mi0.mv0.bcw = 0; mi0.mv0.prec = 0; mi0.mv1.bcw = 0; mi0.mv1.prec = 0;
    mi1.mv0.bcw = 0; mi1.mv0.prec = 0; mi1.mv1.bcw = 0; mi1.mv1.prec = 0;

    MVc z = {0, 0, 0, 0, 0};
    int par = idx0 & 1;
    int dir0 = 0;
    MVc m0 = z;
    if (mi0.dir & (1 + par)) {
        dir0 = 1 + par;
        m0 = par ? mi0.mv1 : mi0.mv0;
    } else if (mi0.dir & (2 - par)) {
        dir0 = 2 - par;
        m0 = par ? mi0.mv0 : mi0.mv1;
    }
    par = idx1 & 1;
    int dir1 = 0;
    MVc m1 = z;
    if (mi1.dir & (1 + par)) {
        dir1 = 1 + par;
        m1 = par ? mi1.mv1 : mi1.mv0;
    } else if (mi1.dir & (2 - par)) {
        dir1 = 2 - par;
        m1 = par ? mi1.mv0 : mi1.mv1;
    }

    /* combined-region MV info (update_gpm_mv_ctx :1482) */
    int idir = dir0 | dir1;
    MVc smv0 = z, smv1 = z;
    if (idir == 1) {
        smv0 = mi1.mv0;
    } else if (idir == 2) {
        smv1 = mi1.mv1;
    } else if (dir0 == 1 && dir1 == 2) {
        smv0 = mi0.mv0; smv1 = mi1.mv1;
    } else if (dir0 == 2 && dir1 == 1) {
        smv0 = mi1.mv0; smv1 = mi0.mv1;
    }

    for (int y = 0; y < nh; y++)
        for (int x = 0; x < nw; x++) {
            int msk = gpm_unit_msk(split_dir, nw, nh, x, y);
            int ud;
            MVc u0, u1;
            if (msk == 2) { ud = idir; u0 = smv0; u1 = smv1; }
            else if (msk == 0) { ud = dir0; u0 = mi0.mv0; u1 = mi0.mv1; }
            else { ud = dir1; u0 = mi1.mv0; u1 = mi1.mv1; }
            if (ud & 1) {
                ifill(p, 0, u0, ux + x, uy + y, 1, 1);
                ifill_tmvp(p, 0, u0, ux + x, uy + y, 1, 1);
            }
            if (ud & 2) {
                ifill(p, 1, u1, ux + x, uy + y, 1, 1);
                ifill_tmvp(p, 1, u1, ux + x, uy + y, 1, 1);
            }
        }
    *d0_o = dir0; *m0_o = m0;
    *d1_o = dir1; *m1_o = m1;
}

/* drv_mmvd_merge_mvp_b parity (:736): the refinement offset rides the
 * larger-|dist| list and is TMVP-scaled onto the other */
static MIc drv_mmvd_b(Pc *p, int ux, int uy, int nw, int nh, int merge_idx,
                      int is_small)
{
    const EntryParams *e = p->ep;
    int base = merge_idx / 32;
    MIc mi = derive_merge_mvp_b(p, ux, uy, nw, nh, base,
                                e->max_num_merge_cand, is_small);
    int idx = merge_idx - (merge_idx / 64) * 64 - base * 32;
    int dx, dy;
    mmvd_offset_c(idx, e->mmvd_shift, &dx, &dy);
    int d0x = dx, d0y = dy, d1x = dx, d1y = dy;
    if (mi.dir == 3) {
        int d0 = e->dist_ref0[mi.mv0.ref];
        int d1 = e->dist_ref1[mi.mv1.ref];
        int a0 = d0 < 0 ? -d0 : d0, a1 = d1 < 0 ? -d1 : d1;
        if (d0 == d1) {
        } else if (a0 < a1) {
            int scale = derive_tmvp_scale(d0, d1);
            d0x = tmvp_scale_one(scale, d1x);
            d0y = tmvp_scale_one(scale, d1y);
        } else {
            int scale = derive_tmvp_scale(d1, d0);
            d1x = tmvp_scale_one(scale, d0x);
            d1y = tmvp_scale_one(scale, d0y);
        }
    } else if (mi.dir == 2) {
        d0x = d0y = 0;
    } else {
        d1x = d1y = 0;
    }
    mi.mv0.x += d0x;
    mi.mv0.y += d0y;
    mi.mv1.x += d1x;
    mi.mv1.y += d1y;
    if (is_small && mi.dir == 3)
        mi.dir = 1;
    update_mv_ctx_b(p, mi.mv0, mi.mv1, ux, uy, nw, nh, mi.dir);
    return mi;
}

static int code_ref_idx1(Pc *p, int nb_active);

/* =====================================================================
 * Affine motion + SbTMVP (drv/affine.py parity; reference
 * drv_affine_mvp.c — derive_affine_delta_mvs :982, derive_cp_from_cand
 * :1016, drv_affine_mvp :1225, derive_affine_merge_mv :2565,
 * compute_subblock_mvs :2943, store_affine_info :3169,
 * derive_sub_pu_merge_cand :1790)
 * ===================================================================== */


#define AFFINE_SHIFT 7
#define RND_AFF (4 << 11)
#define AMV_MAX ((1 << 17) - 1)
#define AMV_MIN (-(1 << 17))
#define CLIP_PERIOD (1 << 18)

typedef struct { MVc lt, rt, lb; } CPc;
typedef struct AffInfoC_ { CPc cps[2]; int type, ux, uy, nw, nh, l2w, l2h; }
    AffInfoC;
typedef struct { CPc cinfo[2]; int dir, type; } AffMergeC;
typedef struct { MVc h, v; } DMVc;

/* candidate names */
enum { CAND_A0, CAND_A1, CAND_A2, CAND_A3,
       CAND_B0, CAND_B1, CAND_B2, CAND_B3 };

static MVc clip_mv18_c(MVc mv)
{
    if (mv.x < AMV_MIN) mv.x = AMV_MIN;
    if (mv.x > AMV_MAX) mv.x = AMV_MAX;
    if (mv.y < AMV_MIN) mv.y = AMV_MIN;
    if (mv.y > AMV_MAX) mv.y = AMV_MAX;
    return mv;
}

static MVc mv_clip_periodic_c(MVc mv)
{
    int x = (mv.x + CLIP_PERIOD) & (CLIP_PERIOD - 1);
    int y = (mv.y + CLIP_PERIOD) & (CLIP_PERIOD - 1);
    mv.x = x >= (CLIP_PERIOD >> 1) ? x - CLIP_PERIOD : x;
    mv.y = y >= (CLIP_PERIOD >> 1) ? y - CLIP_PERIOD : y;
    return mv;
}

static MVc round_affine_mv2_c(MVc mv)
{
    int rnd = 1 << (AFFINE_SHIFT - 1);
    mv.x = (mv.x + rnd - (mv.x >= 0 ? 1 : 0)) >> AFFINE_SHIFT;
    mv.y = (mv.y + rnd - (mv.y >= 0 ? 1 : 0)) >> AFFINE_SHIFT;
    return mv;
}

static DMVc derive_affine_delta_mvs_c(const CPc *c, int l2w, int l2h,
                                      int affine_type)
{
    DMVc d;
    int sh = AFFINE_SHIFT - l2w;
    d.h.x = (c->rt.x - c->lt.x) << sh;
    d.h.y = (c->rt.y - c->lt.y) << sh;
    d.h.ref = 0; d.h.bcw = 0; d.h.prec = 0;
    if (affine_type) {
        int sv = AFFINE_SHIFT - l2h;
        d.v.x = (c->lb.x - c->lt.x) << sv;
        d.v.y = (c->lb.y - c->lt.y) << sv;
    } else {
        d.v.x = -d.h.y;
        d.v.y = d.h.x;
    }
    d.v.ref = 0; d.v.bcw = 0; d.v.prec = 0;
    return d;
}

static void aff_cand_pos(int ux, int uy, int nw, int nh, int cand,
                         int *px, int *py)
{
    switch (cand) {
    case CAND_A0: *px = ux - 1; *py = uy + nh; break;
    case CAND_A1: *px = ux - 1; *py = uy + nh - 1; break;
    case CAND_A2: *px = ux - 1; *py = uy; break;
    case CAND_A3: *px = ux - 1; *py = uy - 1; break;
    case CAND_B0: *px = ux + nw; *py = uy - 1; break;
    case CAND_B1: *px = ux + nw - 1; *py = uy - 1; break;
    case CAND_B2: *px = ux - 1; *py = uy - 1; break;
    default:      *px = ux;     *py = uy - 1; break; /* B3 */
    }
}

static void aff_avail_masks(const Pc *p, int ux, int uy, int nw, int nh,
                            int *aff, int *rp0, int *rp1)
{
    *aff = *rp0 = *rp1 = 0;
    for (int cand = 0; cand < 8; cand++) {
        int px, py;
        aff_cand_pos(ux, uy, nw, nh, cand, &px, &py);
        if (px < 0 || py < 0 || px >= p->uw || py >= p->uh)
            continue;
        int64_t u = (int64_t)py * p->uw + px;
        if (p->aff_dir[u]) *aff |= 1 << cand;
        if (p->dir0[u]) *rp0 |= 1 << cand;
        if (p->dir1[u]) *rp1 |= 1 << cand;
    }
}

/* stored CPs, or the line-buffer form for the CTU row above
 * (rotate_affine_cp: lt/rt = bottom sub-block MVs) */
static CPc aff_ngh_cps(const Pc *p, const AffInfoC *info, int lst,
                       int above_row)
{
    if (!above_row)
        return info->cps[lst];
    const MVc *mvs = lst ? p->mv1 : p->mv0;
    int by = info->uy + info->nh - 1;
    CPc out;
    out.lt = mvs[(int64_t)by * p->uw + info->ux];
    out.rt = mvs[(int64_t)by * p->uw + info->ux + info->nw - 1];
    memset(&out.lb, 0, sizeof(out.lb));
    return out;
}

static CPc derive_cp_from_cand_c(const CPc *ngh_cps, const AffInfoC *ngh,
                                 int ngh_type, int ux, int uy, int l2w,
                                 int l2h, int affine_type, int above_row)
{
    int x0 = ux << 2, y0 = uy << 2;
    int ngh_x0 = ngh->ux << 2, ngh_y0 = ngh->uy << 2;
    int dpx = x0 - ngh_x0;
    int dpy = above_row ? 0 : (y0 - ngh_y0);

    DMVc dmv = derive_affine_delta_mvs_c(ngh_cps, ngh->l2w, ngh->l2h,
                                         ngh_type);
    if (above_row || ngh_type == 0) {
        dmv.v.x = -dmv.h.y;
        dmv.v.y = dmv.h.x;
    }

    int8_t ref = ngh_cps->lt.ref;
    int8_t bcw = ngh_cps->lt.bcw;
    int8_t prec = ngh_cps->lt.prec;
    int lt_x = (ngh_cps->lt.x << AFFINE_SHIFT) + dmv.h.x * dpx
               + dmv.v.x * dpy;
    int lt_y = (ngh_cps->lt.y << AFFINE_SHIFT) + dmv.h.y * dpx
               + dmv.v.y * dpy;

    CPc out;
    MVc t;
#define AFF_FIN(dst, xx, yy) do { \
        t.x = (xx); t.y = (yy); t.ref = ref; t.bcw = bcw; t.prec = prec; \
        t = round_affine_mv2_c(t); t = clip_mv18_c(t); \
        t.ref = ref; t.bcw = bcw; t.prec = prec; \
        (dst) = t; } while (0)
    AFF_FIN(out.lt, lt_x, lt_y);
    AFF_FIN(out.rt, lt_x + (dmv.h.x << l2w), lt_y + (dmv.h.y << l2w));
    memset(&out.lb, 0, sizeof(out.lb));
    if (affine_type)
        AFF_FIN(out.lb, lt_x + (dmv.v.x << l2h), lt_y + (dmv.v.y << l2h));
#undef AFF_FIN
    return out;
}

static MVc round_aff_prec(MVc mv, int prec_amvr)
{
    return mv_round_prec(mv, PREC_INTERNAL, prec_amvr);
}

static const AffInfoC *aff_info_at(const Pc *p, int px, int py)
{
    if (px < 0 || py < 0 || px >= p->uw || py >= p->uh)
        return 0;
    int idx = p->aff_idx[(int64_t)py * p->uw + px];
    return idx < 0 ? 0 : &p->aff_pool[idx];
}

static int aff_above_row(const Pc *p, int cand, int uy, int py)
{
    int sh = p->ep->log2_ctb - 2;
    return cand >= CAND_A3 && ((uy - 1) >> sh) != (uy >> sh) && py < uy;
}

/* drv/affine.py _affine_amvp_cand */
static int affine_amvp_cand(const Pc *p, int ux, int uy, int nw, int nh,
                            int l2w, int l2h, int cand, int inter_dir,
                            int ref_idx, int ref_opp, int rp0, int rp1,
                            int aff, int prec_amvr, int affine_type,
                            CPc *out)
{
    if (!(aff & (1 << cand)))
        return 0;
    int lst = inter_dir - 1;
    int rpl_msk = lst ? rp1 : rp0;
    int rpl_opp_msk = lst ? rp0 : rp1;
    int px, py;
    aff_cand_pos(ux, uy, nw, nh, cand, &px, &py);
    const AffInfoC *info = aff_info_at(p, px, py);
    if (!info)
        return 0;
    int above = aff_above_row(p, cand, uy, py);
    int got = 0;
    CPc cp;
    if (rpl_msk & (1 << cand)) {
        CPc ngh = aff_ngh_cps(p, info, lst, above);
        if (ngh.lt.ref == ref_idx) {
            cp = derive_cp_from_cand_c(&ngh, info, info->type, ux, uy,
                                       l2w, l2h, affine_type, above);
            got = 1;
        }
    }
    if (!got && (rpl_opp_msk & (1 << cand))) {
        CPc ngh = aff_ngh_cps(p, info, 1 - lst, above);
        if (ngh.lt.ref == ref_opp) {
            cp = derive_cp_from_cand_c(&ngh, info, info->type, ux, uy,
                                       l2w, l2h, affine_type, above);
            cp.lt.ref = (int8_t)ref_idx;
            cp.rt.ref = (int8_t)ref_idx;
            if (affine_type)
                cp.lb.ref = (int8_t)ref_idx;
            got = 1;
        }
    }
    if (!got)
        return 0;
    cp.lt = round_aff_prec(cp.lt, prec_amvr);
    cp.rt = round_aff_prec(cp.rt, prec_amvr);
    if (affine_type)
        cp.lb = round_aff_prec(cp.lb, prec_amvr);
    *out = cp;
    return 1;
}

/* translational corner candidate (drv/affine.py _mvp_cand) */
static int aff_mvp_cand(const Pc *p, int ux, int uy, int nw, int nh,
                        int cand, int inter_dir, int ref_idx, int ref_opp,
                        int rp0, int rp1, MVc *out)
{
    int lst = inter_dir - 1;
    int px, py;
    aff_cand_pos(ux, uy, nw, nh, cand, &px, &py);
    int rpl_list = lst ? rp1 : rp0;
    int rpl_opp = lst ? rp0 : rp1;
    const MVc *mvs = lst ? p->mv1 : p->mv0;
    const MVc *mvs_opp = lst ? p->mv0 : p->mv1;
    int64_t u = (int64_t)py * p->uw + px;
    if (rpl_list & (1 << cand)) {
        MVc mv = mvs[u];
        if (mv.ref == ref_idx) { *out = mv; return 1; }
    }
    if (rpl_opp & (1 << cand)) {
        MVc mv = mvs_opp[u];
        if (mv.ref == ref_opp) { mv.ref = (int8_t)ref_idx; *out = mv;
                                 return 1; }
    }
    return 0;
}

/* drv/affine.py affine_amvp */
static CPc affine_amvp_c(Pc *p, int ux, int uy, int nw, int nh, int l2w,
                         int l2h, int ref_idx, int ref_opp, int mvp_idx,
                         int inter_dir, int affine_type, int prec_amvr)
{
    int aff, rp0, rp1;
    aff_avail_masks(p, ux, uy, nw, nh, &aff, &rp0, &rp1);
    CPc cand_list[2];
    int ncand = 0;
    CPc cp;

    static const int left_c[2] = {CAND_A0, CAND_A1};
    static const int abv_c[3] = {CAND_B0, CAND_B1, CAND_B2};
    for (int i = 0; i < 2; i++)
        if (affine_amvp_cand(p, ux, uy, nw, nh, l2w, l2h, left_c[i],
                             inter_dir, ref_idx, ref_opp, rp0, rp1, aff,
                             prec_amvr, affine_type, &cp)) {
            cand_list[ncand++] = cp;
            break;
        }
    for (int i = 0; i < 3; i++)
        if (affine_amvp_cand(p, ux, uy, nw, nh, l2w, l2h, abv_c[i],
                             inter_dir, ref_idx, ref_opp, rp0, rp1, aff,
                             prec_amvr, affine_type, &cp)) {
            cand_list[ncand++] = cp;
            break;
        }

    if (ncand >= 2) {
        CPc o = cand_list[mvp_idx];
        o.lt = round_aff_prec(o.lt, prec_amvr);
        o.rt = round_aff_prec(o.rt, prec_amvr);
        o.lb = round_aff_prec(o.lb, prec_amvr);
        return o;
    }

    /* constructed from translational corners */
    MVc lt, rt, lb;
    int mask = 0;
    static const int lt_c[3] = {CAND_B2, CAND_B3, CAND_A2};
    static const int rt_c[2] = {CAND_B1, CAND_B0};
    static const int lb_c[2] = {CAND_A1, CAND_A0};
    for (int i = 0; i < 3; i++)
        if (aff_mvp_cand(p, ux, uy, nw, nh, lt_c[i], inter_dir, ref_idx,
                         ref_opp, rp0, rp1, &lt)) { mask |= 1; break; }
    for (int i = 0; i < 2; i++)
        if (aff_mvp_cand(p, ux, uy, nw, nh, rt_c[i], inter_dir, ref_idx,
                         ref_opp, rp0, rp1, &rt)) { mask |= 2; break; }
    for (int i = 0; i < 2; i++)
        if (aff_mvp_cand(p, ux, uy, nw, nh, lb_c[i], inter_dir, ref_idx,
                         ref_opp, rp0, rp1, &lb)) { mask |= 4; break; }
    MVc z;
    memset(&z, 0, sizeof(z));
    MVc mv_lt = round_aff_prec((mask & 1) ? lt : z, prec_amvr);
    MVc mv_rt = round_aff_prec((mask & 2) ? rt : z, prec_amvr);
    MVc mv_lb = round_aff_prec((mask & 4) ? lb : z, prec_amvr);

    if (mask == 0x7 || (mask == 0x3 && affine_type == 0)) {
        CPc o = {mv_lt, mv_rt, mv_lb};
        cand_list[ncand++] = o;
    }
    if (ncand < 2 && (mask & 0x4)) {
        CPc o = {mv_lb, mv_lb, mv_lb};
        cand_list[ncand++] = o;
    }
    if (ncand < 2 && (mask & 0x2)) {
        CPc o = {mv_rt, mv_rt, mv_rt};
        cand_list[ncand++] = o;
    }
    if (ncand < 2 && (mask & 0x1)) {
        CPc o = {mv_lt, mv_lt, mv_lt};
        cand_list[ncand++] = o;
    }
    if (ncand < 2 && p->ep->tmvp_enabled) {
        MVc t;
        if (derive_tmvp_amvp(p, inter_dir - 1, ref_idx, ux, uy, nw, nh, -1,
                             &t)) {
            t = round_aff_prec(t, prec_amvr);
            t.ref = (int8_t)ref_idx;
            CPc o = {t, t, t};
            cand_list[ncand++] = o;
        }
    }
    while (ncand < 2) {
        CPc o = {z, z, z};
        cand_list[ncand++] = o;
    }
    CPc o = cand_list[mvp_idx];
    o.lt = round_aff_prec(o.lt, prec_amvr);
    o.rt = round_aff_prec(o.rt, prec_amvr);
    if (affine_type)
        o.lb = round_aff_prec(o.lb, prec_amvr);
    return o;
}

/* corner C0 TMVP for the constructed merge candidate
 * (drv/inter_mvp.py _affine_corner_tmvp) */
static int aff_corner_tmvp(const Pc *p, int ux, int uy, int nw, int nh,
                           MVc *t0, MVc *t1)
{
    const EntryParams *e = p->ep;
    int c0x = (ux + nw) & ~1, c0y = (uy + nh) & ~1;
    int a0 = col_avail(p, 0, c0x, c0y, uy, ux);
    int a1 = col_avail(p, 1, c0x, c0y, uy, ux);
    if (!(a0 || a1))
        return 0;
    if (e->tmvp_ldc && a0 && a1) {
        /* both planes feed their matching list; crossed when the
         * collocated picture comes from list 0 (drv_affine_mvp.c
         * :687/:717) */
        int s0 = e->col_ref_l0 ? 1 : 0;
        *t0 = tmvp_scaled(p, 0, 0, s0, c0x, c0y, -1);
        *t1 = tmvp_scaled(p, 1, 0, s0 ^ 1, c0x, c0y, -1);
    } else {
        /* non-ldc: one plane feeds BOTH lists, preference follows the
         * collocated list (:830 prefers plane 0, :904 plane 1) */
        int src;
        if (e->tmvp_ldc)
            src = a0 ? 0 : 1;
        else if (!e->col_ref_l0)
            src = a0 ? 0 : 1;
        else
            src = a1 ? 1 : 0;
        *t0 = tmvp_scaled(p, 0, 0, src, c0x, c0y, -1);
        *t1 = tmvp_scaled(p, 1, 0, src, c0x, c0y, -1);
    }
    return 3;
}

/* drv/affine.py affine_merge (derive_affine_merge_mv :2565) */
static AffMergeC affine_merge_c(Pc *p, int ux, int uy, int nw, int nh,
                                int l2w, int l2h, int mrg_idx)
{
    int aff, rp0, rp1;
    aff_avail_masks(p, ux, uy, nw, nh, &aff, &rp0, &rp1);
    int nb_cand = 0;
    AffMergeC out;
    memset(&out, 0, sizeof(out));

#define INHERIT(cand) do { \
        int px_, py_; \
        aff_cand_pos(ux, uy, nw, nh, (cand), &px_, &py_); \
        const AffInfoC *info = aff_info_at(p, px_, py_); \
        int above = aff_above_row(p, (cand), uy, py_); \
        int d = ((rp0 >> (cand)) & 1) | (((rp1 >> (cand)) & 1) << 1); \
        memset(&out, 0, sizeof(out)); \
        if (d & 1) { \
            CPc ngh = aff_ngh_cps(p, info, 0, above); \
            out.cinfo[0] = derive_cp_from_cand_c(&ngh, info, info->type, \
                                                 ux, uy, l2w, l2h, \
                                                 info->type, above); \
        } \
        if (d & 2) { \
            CPc ngh = aff_ngh_cps(p, info, 1, above); \
            out.cinfo[1] = derive_cp_from_cand_c(&ngh, info, info->type, \
                                                 ux, uy, l2w, l2h, \
                                                 info->type, above); \
        } \
        out.dir = d; \
        out.type = info->type; \
    } while (0)

    int lft_msk = (aff & (1 << CAND_A0)) ? (1 << CAND_A0)
                                         : (aff & (1 << CAND_A1));
    if (lft_msk) {
        INHERIT(lft_msk & (1 << CAND_A0) ? CAND_A0 : CAND_A1);
        if (nb_cand == mrg_idx)
            return out;
        nb_cand++;
    }
    int abv_cand = -1;
    for (int c = CAND_B0; c <= CAND_B2; c++)
        if (aff & (1 << c)) { abv_cand = c; break; }
    if (abv_cand >= 0) {
        INHERIT(abv_cand);
        if (nb_cand == mrg_idx)
            return out;
        nb_cand++;
    }
#undef INHERIT

    /* constructed corners */
    MVc mi0[4], mi1[4];
    int have0[4] = {0, 0, 0, 0}, have1[4] = {0, 0, 0, 0};
    int avail_cp = 0;

#define CORNER(cands, ncs, idx) do { \
        for (int i_ = 0; i_ < (ncs); i_++) { \
            int c_ = (cands)[i_]; \
            if (((rp0 | rp1) >> c_) & 1) { \
                int px_, py_; \
                aff_cand_pos(ux, uy, nw, nh, c_, &px_, &py_); \
                int64_t u_ = (int64_t)py_ * p->uw + px_; \
                if ((rp0 >> c_) & 1) { mi0[idx] = p->mv0[u_]; \
                                       have0[idx] = 1; } \
                if ((rp1 >> c_) & 1) { mi1[idx] = p->mv1[u_]; \
                                       have1[idx] = 1; } \
                avail_cp |= 1 << (idx); \
                break; \
            } \
        } \
    } while (0)

    static const int cp0_c[3] = {CAND_B2, CAND_B3, CAND_A2};
    static const int cp1_c[2] = {CAND_B1, CAND_B0};
    static const int cp2_c[2] = {CAND_A1, CAND_A0};
    CORNER(cp0_c, 3, 0);
    CORNER(cp1_c, 2, 1);
    CORNER(cp2_c, 2, 2);
#undef CORNER
    if (p->ep->tmvp_enabled) {
        MVc t0, t1;
        if (aff_corner_tmvp(p, ux, uy, nw, nh, &t0, &t1)) {
            mi0[3] = t0; have0[3] = 1;
            mi1[3] = t1; have1[3] = 1;
            avail_cp |= 8;
        }
    }

    /* 3-CP models */
    static const int combos[4][3] = {{0, 1, 2}, {0, 1, 3}, {0, 2, 3},
                                     {1, 2, 3}};
    static const int need3[4] = {0x7, 0xB, 0xD, 0xE};
    if (p->ep->affine_6param) {
        for (int model = 0; model < 4; model++) {
            if ((avail_cp & need3[model]) != need3[model])
                continue;
            AffMergeC res;
            memset(&res, 0, sizeof(res));
            int d = 0;
            for (int lst = 0; lst < 2; lst++) {
                MVc *mi = lst ? mi1 : mi0;
                int *have = lst ? have1 : have0;
                const int *ids = combos[model];
                if (!(have[ids[0]] && have[ids[1]] && have[ids[2]]))
                    continue;
                if (mi[ids[0]].ref != mi[ids[1]].ref ||
                    mi[ids[0]].ref != mi[ids[2]].ref)
                    continue;
                int8_t ref = mi[ids[0]].ref;
                int8_t bcw = mi[ids[0]].bcw;
                int8_t prc = mi[ids[0]].prec;
                MVc c0, c1, c2, t;
                if (model == 0) {
                    c0 = mi[0]; c1 = mi[1]; c2 = mi[2];
                } else if (model == 1) {
                    c0 = mi[0]; c1 = mi[1];
                    t.x = mi[0].x - mi[1].x + mi[3].x;
                    t.y = mi[0].y - mi[1].y + mi[3].y;
                    t.ref = 0; t.bcw = 0; t.prec = 0;
                    c2 = clip_mv18_c(t);
                } else if (model == 2) {
                    c0 = mi[0]; c2 = mi[2];
                    t.x = mi[0].x - mi[2].x + mi[3].x;
                    t.y = mi[0].y - mi[2].y + mi[3].y;
                    t.ref = 0; t.bcw = 0; t.prec = 0;
                    c1 = clip_mv18_c(t);
                } else {
                    c1 = mi[1]; c2 = mi[2];
                    t.x = mi[1].x + mi[2].x - mi[3].x;
                    t.y = mi[1].y + mi[2].y - mi[3].y;
                    t.ref = 0; t.bcw = 0; t.prec = 0;
                    c0 = clip_mv18_c(t);
                }
                c0.ref = ref; c0.bcw = bcw; c0.prec = prc;
                c1.ref = ref; c1.bcw = bcw; c1.prec = prc;
                c2.ref = ref; c2.bcw = bcw; c2.prec = prc;
                res.cinfo[lst].lt = c0;
                res.cinfo[lst].rt = c1;
                res.cinfo[lst].lb = c2;
                d |= 1 << lst;
            }
            if (!d)
                continue;
            res.dir = d;
            res.type = 1;
            out = res;
            if (nb_cand == mrg_idx)
                return out;
            nb_cand++;
        }
    }
    /* 2-CP models */
    static const int need2[2] = {0x3, 0x5};
    for (int model = 0; model < 2; model++) {
        if ((avail_cp & need2[model]) != need2[model])
            continue;
        AffMergeC res;
        memset(&res, 0, sizeof(res));
        int d = 0;
        for (int lst = 0; lst < 2; lst++) {
            MVc *mi = lst ? mi1 : mi0;
            int *have = lst ? have1 : have0;
            if (model == 0) {
                if (!(have[0] && have[1]) || mi[0].ref != mi[1].ref)
                    continue;
                res.cinfo[lst].lt = mi[0];
                res.cinfo[lst].rt = mi[1];
                memset(&res.cinfo[lst].lb, 0, sizeof(MVc));
            } else {
                if (!(have[0] && have[2]) || mi[0].ref != mi[2].ref)
                    continue;
                int sh = AFFINE_SHIFT + l2w - l2h;
                MVc rt;
                rt.x = (mi[0].x << AFFINE_SHIFT) + ((mi[2].y - mi[0].y) << sh);
                rt.y = (mi[0].y << AFFINE_SHIFT) - ((mi[2].x - mi[0].x) << sh);
                rt.ref = 0; rt.bcw = 0; rt.prec = 0;
                rt = round_affine_mv2_c(rt);
                rt = clip_mv18_c(rt);
                rt.ref = mi[0].ref;
                rt.bcw = mi[0].bcw;
                rt.prec = mi[0].prec;
                res.cinfo[lst].lt = mi[0];
                res.cinfo[lst].rt = rt;
                res.cinfo[lst].lb = mi[2];
            }
            d |= 1 << lst;
        }
        if (!d)
            continue;
        res.dir = d;
        res.type = 0;
        out = res;
        if (nb_cand == mrg_idx)
            return out;
        nb_cand++;
    }

    memset(&out, 0, sizeof(out));
    out.dir = 3;
    out.type = 0;
    return out;
}

/* drv/affine.py broadcast_mv */
static int aff_broadcast_mv(const DMVc *dmv, int inter_dir)
{
    const int T3 = 9, T5 = 11, T9 = 15;
    int a = dmv->h.x * 4, b = dmv->h.y * 4;
    int c = dmv->v.x * 4, d = dmv->v.y * 4;
#define MAX4(p_, q_, r_, s_) imax(imax(p_, q_), imax(r_, s_))
#define MIN4(p_, q_, r_, s_) imin(imin(p_, q_), imin(r_, s_))
    if (inter_dir == 3) {
        int bw = MAX4(0, a + RND_AFF, c, a + c + RND_AFF)
                 - MIN4(0, a + RND_AFF, c, a + c + RND_AFF);
        int bh = MAX4(0, b, d + RND_AFF, b + d + RND_AFF)
                 - MIN4(0, b, d + RND_AFF, b + d + RND_AFF);
        bw = (bw >> 11) + T3;
        bh = (bh >> 11) + T3;
        return bw * bh > T9 * T9;
    }
    int bw = imax(0, a + RND_AFF) - imin(0, a + RND_AFF);
    int bh = imax(0, b) - imin(0, b);
    bw = (bw >> 11) + T3;
    bh = (bh >> 11) + T3;
    if (bw * bh > T9 * T5)
        return 1;
    bw = imax(0, c) - imin(0, c);
    bh = imax(0, d + RND_AFF) - imin(0, d + RND_AFF);
    bh = (bh >> 11) + T3;
    bw = (bw >> 11) + T3;
    return bw * bh > T5 * T9;
#undef MAX4
#undef MIN4
}

static int aff_check_prof(const AffMergeC *mi, int lst)
{
    const CPc *cp = &mi->cinfo[lst];
    if (mi->type)
        return !((cp->lt.x == cp->rt.x && cp->lt.y == cp->rt.y)
                 && (cp->lt.x == cp->lb.x && cp->lt.y == cp->lb.y));
    return !(cp->lt.x == cp->rt.x && cp->lt.y == cp->rt.y);
}

/* compute_subblock_mvs into the unit maps directly; fills aff/tmvp maps
 * (drv/affine.py compute_subblock_mvs + store_and_subblocks) */
static void aff_store_subblocks(Pc *p, const AffMergeC *mi, int ux, int uy,
                                int l2w, int l2h, int *prof_mask,
                                DMVc *dmv0_o, DMVc *dmv1_o)
{
    int nw = (1 << l2w) >> 2, nh = (1 << l2h) >> 2;
    for (int j = 0; j < nh; j++)
        for (int i = 0; i < nw; i++)
            p->aff_dir[(int64_t)(uy + j) * p->uw + ux + i] = 1;

    DMVc dmv0 = derive_affine_delta_mvs_c(&mi->cinfo[0], l2w, l2h,
                                          mi->type);
    DMVc dmv1 = derive_affine_delta_mvs_c(&mi->cinfo[1], l2w, l2h,
                                          mi->type);
    *dmv0_o = dmv0;
    *dmv1_o = dmv1;
    *prof_mask = 0;

    for (int lst = 0; lst < 2; lst++) {
        if (!(mi->dir & (1 << lst)))
            continue;
        const CPc *c = &mi->cinfo[lst];
        const DMVc *dmv = lst ? &dmv1 : &dmv0;
        int broad = aff_broadcast_mv(dmv, mi->dir);
        uint8_t *dirm = lst ? p->dir1 : p->dir0;
        MVc *mvm = lst ? p->mv1 : p->mv0;
        if (!broad) {
            int vx = (c->lt.x << AFFINE_SHIFT) + dmv->h.x * 2 + dmv->v.x * 2;
            int vy = (c->lt.y << AFFINE_SHIFT) + dmv->h.y * 2 + dmv->v.y * 2;
            for (int i = 0; i < nh; i++) {
                int hx = vx, hy = vy;
                for (int j = 0; j < nw; j++) {
                    MVc m;
                    m.x = hx; m.y = hy; m.ref = 0; m.bcw = 0; m.prec = 0;
                    m = round_affine_mv2_c(m);
                    m = clip_mv18_c(m);
                    m.ref = c->lt.ref; m.bcw = c->lt.bcw;
                    m.prec = c->lt.prec;
                    int64_t u = (int64_t)(uy + i) * p->uw + ux + j;
                    dirm[u] = 1;
                    mvm[u] = m;
                    hx += 4 * dmv->h.x;
                    hy += 4 * dmv->h.y;
                }
                vx += 4 * dmv->v.x;
                vy += 4 * dmv->v.y;
            }
            *prof_mask |= 1 << lst;
        } else {
            int cx = (c->lt.x << AFFINE_SHIFT) + ((dmv->h.x << l2w) >> 1)
                     + ((dmv->v.x << l2h) >> 1);
            int cy = (c->lt.y << AFFINE_SHIFT) + ((dmv->h.y << l2w) >> 1)
                     + ((dmv->v.y << l2h) >> 1);
            MVc m;
            m.x = cx; m.y = cy; m.ref = 0; m.bcw = 0; m.prec = 0;
            m = round_affine_mv2_c(m);
            m = clip_mv18_c(m);
            m.ref = c->lt.ref; m.bcw = c->lt.bcw; m.prec = c->lt.prec;
            for (int i = 0; i < nh; i++)
                for (int j = 0; j < nw; j++) {
                    int64_t u = (int64_t)(uy + i) * p->uw + ux + j;
                    dirm[u] = 1;
                    mvm[u] = m;
                }
        }
    }

    /* TMVP plane: 8x8-aligned sub-block MVs */
    for (int j = 0; j < nh; j++)
        for (int i = 0; i < nw; i++) {
            if (((ux + i) & 1) || ((uy + j) & 1))
                continue;
            int gx = (ux + i) >> 1, gy = (uy + j) >> 1;
            int64_t u = (int64_t)(uy + j) * p->uw + ux + i;
            if (mi->dir & 1) {
                int32_t *cell = p->tmv0 + ((int64_t)gy * p->uw8 + gx) * 3;
                cell[0] = p->mv0[u].x;
                cell[1] = p->mv0[u].y;
                cell[2] = p->mv0[u].ref;
            }
            if (mi->dir & 2) {
                int32_t *cell = p->tmv1 + ((int64_t)gy * p->uw8 + gx) * 3;
                cell[0] = p->mv1[u].x;
                cell[1] = p->mv1[u].y;
                cell[2] = p->mv1[u].ref;
            }
        }

    /* record affine info for inheritance */
    if (p->aff_n < p->aff_cap) {
        AffInfoC *info = &p->aff_pool[p->aff_n];
        info->cps[0] = mi->cinfo[0];
        info->cps[1] = mi->cinfo[1];
        info->type = mi->type;
        info->ux = ux; info->uy = uy; info->nw = nw; info->nh = nh;
        info->l2w = l2w; info->l2h = l2h;
        for (int j = 0; j < nh; j++)
            for (int i = 0; i < nw; i++)
                p->aff_idx[(int64_t)(uy + j) * p->uw + ux + i] =
                    (int32_t)p->aff_n;
        p->aff_n++;
    } else {
        bail(p, ERR_OVERFLOW);
    }
}

/* ---- SbTMVP (drv/affine.py SbTmvpCtx) -------------------------------- */

static void sbt_clip_pos(const Pc *p, int x, int y, int ctb_x, int *ox,
                         int *oy)
{
    const EntryParams *e = p->ep;
    int ctu_s = 1 << e->log2_ctb;
    int is_bnd = ctb_x == e->nb_ctb_pic_w - 1;
    x = imax(0, imin(x, ctu_s + 3 - (is_bnd ? 4 : 0)));
    y = imax(0, imin(y, ctu_s - 1));
    *ox = x & ~7;
    *oy = y & ~7;
}

static int sbt_col_probe(const Pc *p, int px_u, int py_u)
{
    const EntryParams *e = p->ep;
    if (!p->col_dir0)
        return 0;
    if (py_u < 0 || px_u < 0 || py_u >= e->col_uh || px_u >= e->col_uw)
        return 0;
    return (p->col_dir0[(int64_t)py_u * e->col_uw + px_u] ? 1 : 0)
           | (p->col_dir1[(int64_t)py_u * e->col_uw + px_u] ? 2 : 0);
}

static MVc sbt_col_mv_scaled(const Pc *p, int lst_cur, int col_lst,
                             int px_u, int py_u)
{
    const EntryParams *e = p->ep;
    const int32_t *cell = (col_lst ? p->col_mv1 : p->col_mv0)
                          + (((int64_t)(py_u >> 1)) * e->col_uw8
                             + (px_u >> 1)) * 3;
    int dist_col = (col_lst ? e->dist_col1 : e->dist_col0)[cell[2]];
    int dist_ref = (lst_cur ? e->dist_ref1 : e->dist_ref0)[0];
    int scale = derive_tmvp_scale(dist_ref, dist_col);
    MVc out;
    out.x = tmvp_scale_one(scale, tmvp_round_mv(cell[0]));
    out.y = tmvp_scale_one(scale, tmvp_round_mv(cell[1]));
    out.ref = 0; out.bcw = 0; out.prec = 0;
    return out;
}

/* (inter_dir, mv0, mv1) of the collocated field at a clipped CTU-local
 * position derived from tile-local luma coords (SbTmvpCtx._mvs_at) */
static int sbt_mvs_at(const Pc *p, int tile_x, int tile_y, int ctb_x,
                      int ctb_y, MVc *mv0, MVc *mv1)
{
    const EntryParams *e = p->ep;
    int tile_px = tile_x + e->tile_x0;
    int tile_py = tile_y + e->tile_y0;
    int lx = tile_px - (ctb_x << e->log2_ctb);
    int ly = tile_py - (ctb_y << e->log2_ctb);
    int cx, cy;
    sbt_clip_pos(p, lx, ly, ctb_x, &cx, &cy);
    int px_u = ((ctb_x << e->log2_ctb) + cx) >> 2;
    int py_u = ((ctb_y << e->log2_ctb) + cy) >> 2;
    int cand_msk = sbt_col_probe(p, px_u, py_u);
    if (!cand_msk)
        return 0;
    if (e->ldc) {
        int c0 = cand_msk & 1, c1 = cand_msk & 2;
        if (c0 && c1) {
            *mv0 = sbt_col_mv_scaled(p, 0, 0, px_u, py_u);
            *mv1 = sbt_col_mv_scaled(p, 1, 1, px_u, py_u);
        } else if (c0) {
            *mv0 = sbt_col_mv_scaled(p, 0, 0, px_u, py_u);
            *mv1 = sbt_col_mv_scaled(p, 1, 0, px_u, py_u);
        } else {
            *mv0 = sbt_col_mv_scaled(p, 0, 1, px_u, py_u);
            *mv1 = sbt_col_mv_scaled(p, 1, 1, px_u, py_u);
        }
        return 3;
    }
    int inter_dir = 0;
    if (cand_msk & 1) {
        *mv0 = sbt_col_mv_scaled(p, 0, 0, px_u, py_u);
        inter_dir |= 1;
    }
    if (cand_msk & 2) {
        *mv1 = sbt_col_mv_scaled(p, 1, 1, px_u, py_u);
        inter_dir |= 2;
    }
    return inter_dir;
}

/* A1 MV if its ref is the collocated picture (SbTmvpCtx.mv_offset) */
static void sbt_mv_offset(const Pc *p, int ux, int uy, int nw, int nh,
                          int *ox, int *oy)
{
    const EntryParams *e = p->ep;
    *ox = *oy = 0;
    int px = ux - 1, py = uy + nh - 1;
    (void)nw;
    if (iavail(p, 0, px, py)) {
        MVc mv = imv_at(p, 0, px, py);
        if (mv.ref == e->col_ref_idx0) {
            *ox = (mv.x + 7 + (mv.x < 0 ? 1 : 0)) >> 4;
            *oy = (mv.y + 7 + (mv.y < 0 ? 1 : 0)) >> 4;
            return;
        }
    }
    if (iavail(p, 1, px, py)) {
        MVc mv = imv_at(p, 1, px, py);
        if (mv.ref == e->col_ref_idx1) {
            *ox = (mv.x + 7 + (mv.x < 0 ? 1 : 0)) >> 4;
            *oy = (mv.y + 7 + (mv.y < 0 ? 1 : 0)) >> 4;
        }
    }
}

/* derive_sub_block_mvs[_p] per-8x8 unit fills (SbTmvpCtx.derive_units).
 * x0/y0 are tile-local luma coords. */
static void sbt_derive_units(Pc *p, int x0, int y0, int l2w, int l2h,
                             int ctb_x, int ctb_y, int main_dir,
                             MVc main_mv0, MVc main_mv1, int off_x,
                             int off_y, int is_p)
{
    int nb_sb_w = imax(1, (1 << l2w) >> 3);
    int nb_sb_h = imax(1, (1 << l2h) >> 3);
    int sb_w = nb_sb_w == 1 ? (1 << l2w) : 8;
    int sb_h = nb_sb_h == 1 ? (1 << l2h) : 8;
    int is_small = l2w + l2h <= 5;
    int ux = x0 >> 2, uy = y0 >> 2;
    for (int i = 0; i < nb_sb_h; i++)
        for (int j = 0; j < nb_sb_w; j++) {
            int cx = x0 + (sb_w >> 1) + off_x + j * sb_w;
            int cy = y0 + (sb_h >> 1) + off_y + i * sb_h;
            MVc mv0, mv1;
            memset(&mv0, 0, sizeof(mv0));
            memset(&mv1, 0, sizeof(mv1));
            int inter_dir = sbt_mvs_at(p, cx, cy, ctb_x, ctb_y, &mv0, &mv1);
            if (is_p) {
                if (!(inter_dir & 1))
                    mv0 = main_mv0;
                inter_dir = 1;
            } else {
                if (!inter_dir) {
                    mv0 = main_mv0;
                    mv1 = main_mv1;
                    inter_dir = main_dir;
                }
                if (is_small && inter_dir == 3)
                    inter_dir = 1;
            }
            /* _fill_unit */
            int gx = (ux * 4 + 8 * j + 4) >> 3;
            int gy = (uy * 4 + 8 * i + 4) >> 3;
            for (int lst = 0; lst < 2; lst++) {
                if (!(inter_dir & (1 << lst)))
                    continue;
                MVc m = lst ? mv1 : mv0;
                m.ref = 0;
                m.bcw = 0;
                uint8_t *dirm = lst ? p->dir1 : p->dir0;
                MVc *mvm = lst ? p->mv1 : p->mv0;
                for (int dj = 0; dj < 2; dj++)
                    for (int di = 0; di < 2; di++) {
                        int64_t u = (int64_t)(uy + 2 * i + dj) * p->uw
                                    + ux + 2 * j + di;
                        dirm[u] = 1;
                        mvm[u] = m;
                    }
                int32_t *cell = (lst ? p->tmv1 : p->tmv0)
                                + ((int64_t)gy * p->uw8 + gx) * 3;
                cell[0] = m.x;
                cell[1] = m.y;
                cell[2] = 0;
            }
        }
}

/* set_zero_mvs_p/b (SbTmvpCtx.zero_units) */
static void sbt_zero_units(Pc *p, int x0, int y0, int l2w, int l2h,
                           int is_p)
{
    int ux = x0 >> 2, uy = y0 >> 2;
    int nw = (1 << l2w) >> 2, nh = (1 << l2h) >> 2;
    MVc z;
    memset(&z, 0, sizeof(z));
    for (int lst = 0; lst < (is_p ? 1 : 2); lst++) {
        uint8_t *dirm = lst ? p->dir1 : p->dir0;
        MVc *mvm = lst ? p->mv1 : p->mv0;
        int32_t *tm = lst ? p->tmv1 : p->tmv0;
        for (int jj = 0; jj < nh; jj++)
            for (int ii = 0; ii < nw; ii++) {
                int64_t u = (int64_t)(uy + jj) * p->uw + ux + ii;
                dirm[u] = 1;
                mvm[u] = z;
            }
        for (int i = 0; i < imax(1, nh >> 1); i++)
            for (int j = 0; j < imax(1, nw >> 1); j++) {
                int gx = (x0 + 8 * j + 4) >> 3;
                int gy = (y0 + 8 * i + 4) >> 3;
                int32_t *cell = tm + ((int64_t)gy * p->uw8 + gx) * 3;
                cell[0] = 0; cell[1] = 0; cell[2] = 0;
            }
    }
}

/* ---- sb-merge / affine syntax (vcl/inter_pu.py) ---------------------- */

static int nbr_affine_cnt(const Pc *p, int x0, int y0)
{
    int abv = nbr_u8(p, p->m_ctype, x0, y0 - 1, CU_NA);
    int lft = nbr_u8(p, p->m_ctype, x0 - 1, y0, CU_NA);
    return (lft == CU_AFFINE || lft == CU_INTER_SKIP_AFF)
           + (abv == CU_AFFINE || abv == CU_INTER_SKIP_AFF);
}

static int code_sb_merge_flag(Pc *p, int x0, int y0)
{
    return cabac_decode_bin(p->cab,
                            SUBBLOCK_MERGE_FLAG + nbr_affine_cnt(p, x0, y0));
}

static int code_affine_merge_idx(Pc *p, int nb_cand_min1)
{
    int v = 0;
    if (nb_cand_min1 > 0 && cabac_decode_bin(p->cab, AFF_MERGE_IDX)) {
        v = 1;
        while (v < nb_cand_min1 && cabac_decode_bypass(p->cab))
            v++;
    }
    return v;
}

static int code_affine_flag(Pc *p, int x0, int y0)
{
    return cabac_decode_bin(p->cab,
                            AFFINE_FLAG + nbr_affine_cnt(p, x0, y0));
}

static int code_affine_type(Pc *p)
{
    return cabac_decode_bin(p->cab, AFFINE_TYPE);
}

#define PREC_SIXTEENTH 6

static int code_affine_amvr_precision(Pc *p)
{
    static const int order[3] = {PREC_QUARTER, PREC_SIXTEENTH, PREC_INT};
    int idx = cabac_decode_bin(p->cab, IMV_FLAG + 2);
    if (idx)
        idx += cabac_decode_bin(p->cab, IMV_FLAG + 3);
    return order[idx];
}

static void code_affine_mvds(Pc *p, int affine_type, MVc mvds[3])
{
    int n = affine_type ? 3 : 2;
    for (int k = 0; k < n; k++) {
        int mx, my;
        code_mvd(p, &mx, &my);
        mvds[k].x = mx; mvds[k].y = my;
        mvds[k].ref = 0; mvds[k].bcw = 0; mvds[k].prec = 0;
    }
    if (n == 2)
        memset(&mvds[2], 0, sizeof(MVc));
}

/* SB_MERGE dispatch (drv/affine.py drv_sb_merge): returns the CU_F_SB_FLAG
 * value and fills the CU record's prof/dmv fields + MV refs/bcw */
static int drv_sb_merge_c(Pc *p, int32_t *c, int x0, int y0, int l2w,
                          int l2h, int merge_idx, int is_p)
{
    const EntryParams *e = p->ep;
    int tile_x = x0 - e->tile_x0, tile_y = y0 - e->tile_y0;
    int ux = tile_x >> 2, uy = tile_y >> 2;

    if (e->sbtmvp_on) {
        int off_x, off_y;
        sbt_mv_offset(p, ux, uy, (1 << l2w) >> 2, (1 << l2h) >> 2,
                      &off_x, &off_y);
        int ctb_x = x0 >> e->log2_ctb, ctb_y = y0 >> e->log2_ctb;
        int cx = tile_x + ((1 << l2w) >> 1) + off_x;
        int cy = tile_y + ((1 << l2h) >> 1) + off_y;
        MVc m0, m1;
        memset(&m0, 0, sizeof(m0));
        memset(&m1, 0, sizeof(m1));
        int main_dir = sbt_mvs_at(p, cx, cy, ctb_x, ctb_y, &m0, &m1);
        if (main_dir && merge_idx == 0) {
            sbt_derive_units(p, tile_x, tile_y, l2w, l2h, ctb_x, ctb_y,
                             main_dir, m0, m1, off_x, off_y, is_p);
            c[CU_F_INTER_DIR] = 3; /* recon dispatches per unit */
            c[CU_F_MV0REF] = 0;
            c[CU_F_MV1REF] = 0;
            c[CU_F_MV0BCW] = 0;
            c[CU_F_PRED] = MODE_INTER;
            p->prec_amvr = 0;
            return 2;
        }
        if (!e->affine_enabled) {
            sbt_zero_units(p, tile_x, tile_y, l2w, l2h, is_p);
            c[CU_F_INTER_DIR] = is_p ? 1 : 3;
            c[CU_F_MV0REF] = 0;
            c[CU_F_MV1REF] = is_p ? -1 : 0;
            c[CU_F_MV0BCW] = 0;
            c[CU_F_PRED] = MODE_INTER;
            p->prec_amvr = 0;
            return 3;
        }
        merge_idx -= main_dir ? 1 : 0;
    }

    AffMergeC mi = affine_merge_c(p, ux, uy, (1 << l2w) >> 2,
                                  (1 << l2h) >> 2, l2w, l2h, merge_idx);
    mi.cinfo[0].lt.prec = 0; mi.cinfo[0].rt.prec = 0;
    mi.cinfo[0].lb.prec = 0;
    mi.cinfo[1].lt.prec = 0; mi.cinfo[1].rt.prec = 0;
    mi.cinfo[1].lb.prec = 0;
    if (is_p)
        mi.dir = 1;
    int prof_mask;
    DMVc dmv0, dmv1;
    aff_store_subblocks(p, &mi, ux, uy, l2w, l2h, &prof_mask, &dmv0, &dmv1);
    int pd = 0;
    if (e->affine_prof) {
        pd = prof_mask;
        if ((pd & 1) && !aff_check_prof(&mi, 0))
            pd &= ~1;
        if ((pd & 2) && !aff_check_prof(&mi, 1))
            pd &= ~2;
        pd &= mi.dir;
    }
    c[CU_F_INTER_DIR] = mi.dir;
    c[CU_F_MV0REF] = (mi.dir & 1) ? mi.cinfo[0].lt.ref : -1;
    c[CU_F_MV1REF] = (mi.dir & 2) ? mi.cinfo[1].lt.ref : -1;
    c[CU_F_MV0BCW] = (mi.dir & 1) ? mi.cinfo[0].lt.bcw
                                  : mi.cinfo[1].lt.bcw;
    c[CU_F_PROF_DIR] = pd;
    c[CU_F_DMV0HX] = dmv0.h.x; c[CU_F_DMV0HY] = dmv0.h.y;
    c[CU_F_DMV0VX] = dmv0.v.x; c[CU_F_DMV0VY] = dmv0.v.y;
    c[CU_F_DMV1HX] = dmv1.h.x; c[CU_F_DMV1HY] = dmv1.h.y;
    c[CU_F_DMV1VX] = dmv1.v.x; c[CU_F_DMV1VY] = dmv1.v.y;
    c[CU_F_PRED] = MODE_INTER;
    p->prec_amvr = 0;
    return 1;
}

/* affine AMVP read + derivation (vcl/inter_pu.py _affine_mvp_read_apply
 * + drv/affine.py drv_affine_amvp_apply) */
static void affine_amvp_read_apply(Pc *p, int32_t *c, int x0, int y0,
                                   int l2w, int l2h, int inter_dir)
{
    const EntryParams *e = p->ep;
    int ux = (x0 - e->tile_x0) >> 2, uy = (y0 - e->tile_y0) >> 2;
    int nw = (1 << l2w) >> 2, nh = (1 << l2h) >> 2;
    int atype = e->affine_6param ? code_affine_type(p) : 0;

    int ridx0 = 0, ridx1 = 0;
    MVc mvds0[3], mvds1[3];
    memset(mvds0, 0, sizeof(mvds0));
    memset(mvds1, 0, sizeof(mvds1));
    int mvp0 = 0, mvp1 = 0;

    if (inter_dir == 3) {
        ridx0 = e->nb_active_ref0 > 1 ? code_ref_idx(p, e->nb_active_ref0)
                                      : e->nb_active_ref0 - 1;
        code_affine_mvds(p, atype, mvds0);
        mvp0 = cabac_decode_bin(p->cab, MVP_IDX);
        ridx1 = code_ref_idx1(p, e->nb_active_ref1);
        if (!e->mvd1_zero)
            code_affine_mvds(p, atype, mvds1);
        mvp1 = cabac_decode_bin(p->cab, MVP_IDX);
    } else if (inter_dir == 1) {
        ridx0 = e->nb_active_ref0 > 1 ? code_ref_idx(p, e->nb_active_ref0)
                                      : e->nb_active_ref0 - 1;
        code_affine_mvds(p, atype, mvds0);
        mvp0 = cabac_decode_bin(p->cab, MVP_IDX);
        memcpy(mvds1, mvds0, sizeof(mvds0));
        mvp1 = mvp0; /* unused */
    } else {
        ridx1 = code_ref_idx1(p, e->nb_active_ref1);
        code_affine_mvds(p, atype, mvds1);
        mvp1 = cabac_decode_bin(p->cab, MVP_IDX);
        memcpy(mvds0, mvds1, sizeof(mvds1));
        mvp0 = mvp1;
    }

    int prec = PREC_QUARTER;
    if (e->affine_amvr) {
        int nz = 0;
        if (inter_dir & 1)
            for (int k = 0; k < 3; k++)
                nz |= mvds0[k].x || mvds0[k].y;
        if (inter_dir & 2)
            for (int k = 0; k < 3; k++)
                nz |= mvds1[k].x || mvds1[k].y;
        if (nz)
            prec = code_affine_amvr_precision(p);
    }
    p->prec_amvr = prec;

    int bcw = 2;
    if (inter_dir == 3)
        bcw = maybe_bcw(p, l2w, l2h);

    AffMergeC mi;
    memset(&mi, 0, sizeof(mi));
    mi.type = atype;
    mi.dir = inter_dir;

    for (int lst = 0; lst < 2; lst++) {
        if (!(inter_dir & (1 << lst)))
            continue;
        int ridx = lst ? ridx1 : ridx0;
        int ropp = lst ? e->rpl1_opp[ridx] : e->rpl0_opp[ridx];
        int mvpi = lst ? mvp1 : mvp0;
        MVc *mvd = lst ? mvds1 : mvds0;
        CPc cp = affine_amvp_c(p, ux, uy, nw, nh, l2w, l2h, ridx, ropp,
                               mvpi, lst + 1, atype, prec);
        MVc d_lt = mv_change_prec(mvd[0], prec, PREC_INTERNAL);
        MVc d_rt = mv_change_prec(mvd[1], prec, PREC_INTERNAL);
        MVc lt, rt;
        lt.x = cp.lt.x + d_lt.x; lt.y = cp.lt.y + d_lt.y;
        rt.x = cp.rt.x + d_lt.x + d_rt.x;
        rt.y = cp.rt.y + d_lt.y + d_rt.y;
        lt.ref = rt.ref = 0; lt.bcw = rt.bcw = 0; lt.prec = rt.prec = 0;
        lt = mv_clip_periodic_c(lt);
        rt = mv_clip_periodic_c(rt);
        lt.ref = (int8_t)ridx; lt.bcw = (int8_t)(bcw + 1);
        lt.prec = (int8_t)prec;
        rt.ref = (int8_t)ridx; rt.bcw = (int8_t)(bcw + 1);
        rt.prec = (int8_t)prec;
        mi.cinfo[lst].lt = lt;
        mi.cinfo[lst].rt = rt;
        memset(&mi.cinfo[lst].lb, 0, sizeof(MVc));
        if (atype) {
            MVc d_lb = mv_change_prec(mvd[2], prec, PREC_INTERNAL);
            MVc lb;
            lb.x = cp.lb.x + d_lt.x + d_lb.x;
            lb.y = cp.lb.y + d_lt.y + d_lb.y;
            lb.ref = 0; lb.bcw = 0; lb.prec = 0;
            lb = mv_clip_periodic_c(lb);
            lb.ref = (int8_t)ridx;
            lb.bcw = (int8_t)(bcw + 1);
            lb.prec = (int8_t)prec;
            mi.cinfo[lst].lb = lb;
        }
    }

    p->prec_amvr = 0;
    int prof_mask;
    DMVc dmv0, dmv1;
    int tux = ux, tuy = uy;
    aff_store_subblocks(p, &mi, tux, tuy, l2w, l2h, &prof_mask, &dmv0,
                        &dmv1);
    int pd = 0;
    if (e->affine_prof) {
        pd = prof_mask;
        if ((pd & 1) && !aff_check_prof(&mi, 0))
            pd &= ~1;
        if ((pd & 2) && !aff_check_prof(&mi, 1))
            pd &= ~2;
        pd &= inter_dir;
    }
    c[CU_F_SB_FLAG] = 1;
    c[CU_F_INTER_DIR] = inter_dir;
    c[CU_F_MV0REF] = (inter_dir & 1) ? ridx0 : -1;
    c[CU_F_MV1REF] = (inter_dir & 2) ? ridx1 : -1;
    c[CU_F_MV0BCW] = bcw + 1;
    c[CU_F_PROF_DIR] = pd;
    c[CU_F_DMV0HX] = dmv0.h.x; c[CU_F_DMV0HY] = dmv0.h.y;
    c[CU_F_DMV0VX] = dmv0.v.x; c[CU_F_DMV0VY] = dmv0.v.y;
    c[CU_F_DMV1HX] = dmv1.h.x; c[CU_F_DMV1HY] = dmv1.h.y;
    c[CU_F_DMV1VX] = dmv1.v.x; c[CU_F_DMV1VY] = dmv1.v.y;
    c[CU_F_PRED] = MODE_INTER;
}

/* prediction_unit_inter_p parity (affine/sb-merge/mmvd/ciip/gpm gated) */
static void pred_unit_inter_p(Pc *p, int32_t *c, int x0, int y0,
                              int l2w, int l2h, int skip, int merge)
{
    const EntryParams *e = p->ep;
    int ux = (x0 - e->tile_x0) >> 2, uy = (y0 - e->tile_y0) >> 2;
    int nw = (1 << l2w) >> 2, nh = (1 << l2h) >> 2;
    p->prec_amvr = PREC_QUARTER;
    MVc mv0;
    if (merge) {
        /* sb_merge (affine / SbTMVP) rides ahead of merge_data */
        if ((e->sbtmvp_on || e->affine_enabled) && l2w >= 3 && l2h >= 3
            && code_sb_merge_flag(p, x0, y0)) {
            int midx = 0;
            if (e->affine_enabled)
                midx = code_affine_merge_idx(p,
                                             e->affine_nb_merge_cand - 1);
            c[CU_F_MERGE_IDX] = midx;
            c[CU_F_SB_FLAG] = drv_sb_merge_c(p, c, x0, y0, l2w, l2h, midx,
                                             1);
            return;
        }
        /* merge_data_p (gpm gated in P; MMVD + CIIP live) */
        int mf = merge_data_flags(p, l2w, l2h, skip);
        if (mf & 1) {
            int midx = code_mmvd_merge_idx(p, e->max_num_merge_cand);
            c[CU_F_MERGE_IDX] = midx;
            mv0 = drv_mmvd_p(p, ux, uy, nw, nh, midx, l2w + l2h <= 5);
            c[CU_F_MMVD] = 1;
            p->prec_amvr = mv0.prec;
        } else {
            int midx = code_merge_idx(p, e->max_num_merge_cand);
            c[CU_F_MERGE_IDX] = midx;
            mv0 = derive_merge_mvp(p, ux, uy, nw, nh, midx,
                                   e->max_num_merge_cand, l2w + l2h <= 5);
            p->prec_amvr = mv0.prec;
            update_mv_ctx(p, mv0, ux, uy, nw, nh);
        }
        if (mf & 2) {
            c[CU_F_CIIP_WT] = derive_ciip_wt(p, x0, y0, l2w, l2h);
            mv0.bcw = 0; /* CIIP: recon uses the default combine */
        }
    } else {
        if (e->affine_enabled && l2w > 3 && l2h > 3
            && code_affine_flag(p, x0, y0)) {
            affine_amvp_read_apply(p, c, x0, y0, l2w, l2h, 1);
            return;
        }
        int nb_active = e->nb_active_ref0;
        int ref_idx = nb_active > 1 ? code_ref_idx(p, nb_active)
                                    : nb_active - 1;
        int mdx, mdy;
        code_mvd(p, &mdx, &mdy);
        int mvp_idx = cabac_decode_bin(p->cab, MVP_IDX);
        int prec = PREC_QUARTER;
        if (e->amvr && (mdx || mdy))
            prec = code_amvr_precision(p);
        p->prec_amvr = prec;
        mv0 = derive_mvp_cand(p, 0, ref_idx, ux, uy, nw, nh, mvp_idx, 1,
                              prec, l2w + l2h <= 5);
        MVc mvd = {mdx, mdy, 0, 0, 0};
        mvd = mv_change_prec(mvd, prec, PREC_INTERNAL);
        mv0.x += mvd.x;
        mv0.y += mvd.y;
        mv0.ref = (int8_t)ref_idx;
        mv0.bcw = 3; /* BCW_DEFAULT + 1 */
        mv0.prec = (int8_t)prec;
        update_mv_ctx(p, mv0, ux, uy, nw, nh);
    }
    c[CU_F_MV0X] = mv0.x;
    c[CU_F_MV0Y] = mv0.y;
    c[CU_F_MV0REF] = mv0.ref;
    c[CU_F_MV0BCW] = mv0.bcw;
    c[CU_F_MV0PREC] = mv0.prec;
    c[CU_F_PRED] = MODE_INTER;
    (void)skip;
}

/* list-1 ref idx: same binarization as list 0 */
static int code_ref_idx1(Pc *p, int nb_active)
{
    if (nb_active <= 1)
        return nb_active - 1;
    return code_ref_idx(p, nb_active);
}

/* ovcabac_read_ae_inter_dir parity (vcl/inter_pu.py code_inter_dir) */
static int code_inter_dir(Pc *p, int l2w, int l2h)
{
    if (l2w + l2h > 5) {
        int ctx_id = 7 - ((l2w + l2h + 1) >> 1);
        if (cabac_decode_bin(p->cab, INTER_DIR + ctx_id))
            return 3;
    }
    return 1 + cabac_decode_bin(p->cab, INTER_DIR + 5);
}

/* prediction_unit_inter_b parity (affine/smvd/mmvd/ciip/gpm/bcw
 * pre-gated off by the SPS support check) */
static void pred_unit_inter_b(Pc *p, int32_t *c, int x0, int y0,
                              int l2w, int l2h, int skip, int merge)
{
    const EntryParams *e = p->ep;
    int ux = (x0 - e->tile_x0) >> 2, uy = (y0 - e->tile_y0) >> 2;
    int nw = (1 << l2w) >> 2, nh = (1 << l2h) >> 2;
    p->prec_amvr = PREC_QUARTER;
    MIc mi;
    if (merge) {
        if ((e->sbtmvp_on || e->affine_enabled) && l2w >= 3 && l2h >= 3
            && code_sb_merge_flag(p, x0, y0)) {
            int midx = 0;
            if (e->affine_enabled)
                midx = code_affine_merge_idx(p,
                                             e->affine_nb_merge_cand - 1);
            c[CU_F_MERGE_IDX] = midx;
            c[CU_F_SB_FLAG] = drv_sb_merge_c(p, c, x0, y0, l2w, l2h, midx,
                                             0);
            return;
        }
        int mf = merge_data_flags(p, l2w, l2h, skip);
        if (mf & 4) {
            /* GPM: two uni partitions; recon dispatches on CU_F_GPM_DIRS
             * (MV0/MV1 fields carry the partition MVs, inter_dir = 0) */
            int sd, i0, i1, d0, d1;
            MVc m0, m1;
            code_gpm_merge_idx(p, &sd, &i0, &i1);
            drv_gpm_b(p, ux, uy, nw, nh, sd, i0, i1, &d0, &m0, &d1, &m1);
            c[CU_F_GPM_DIRS] = 1 + (d0 - 1) + 2 * (d1 - 1);
            c[CU_F_GPM_SPLIT] = sd;
            c[CU_F_MV0X] = m0.x; c[CU_F_MV0Y] = m0.y;
            c[CU_F_MV0REF] = m0.ref;
            c[CU_F_MV0BCW] = 0; c[CU_F_MV0PREC] = 0;
            c[CU_F_MV1X] = m1.x; c[CU_F_MV1Y] = m1.y;
            c[CU_F_MV1REF] = m1.ref;
            c[CU_F_INTER_DIR] = 0;
            c[CU_F_PRED] = MODE_INTER;
            return;
        }
        if (mf & 1) {
            int midx = code_mmvd_merge_idx(p, e->max_num_merge_cand);
            c[CU_F_MERGE_IDX] = midx;
            mi = drv_mmvd_b(p, ux, uy, nw, nh, midx, l2w + l2h <= 5);
            c[CU_F_MMVD] = 1;
        } else {
            int midx = code_merge_idx(p, e->max_num_merge_cand);
            c[CU_F_MERGE_IDX] = midx;
            mi = derive_merge_mvp_b(p, ux, uy, nw, nh, midx,
                                    e->max_num_merge_cand, l2w + l2h <= 5);
            update_mv_ctx_b(p, mi.mv0, mi.mv1, ux, uy, nw, nh, mi.dir);
        }
        if (mf & 2) {
            c[CU_F_CIIP_WT] = derive_ciip_wt(p, x0, y0, l2w, l2h);
            /* CIIP inter blend ignores the candidate's BCW weight; the
             * MV maps keep it (vcl_coding_unit.c :2554-2555) */
            mi.mv0.bcw = 0;
            mi.mv1.bcw = 0;
        }
        p->prec_amvr = (mi.dir & 1) ? mi.mv0.prec : mi.mv1.prec;
    } else {
        int inter_dir = code_inter_dir(p, l2w, l2h);
        if (e->affine_enabled && l2w > 3 && l2h > 3
            && code_affine_flag(p, x0, y0)) {
            affine_amvp_read_apply(p, c, x0, y0, l2w, l2h, inter_dir);
            return;
        }
        int smvd = 0;
        if (inter_dir == 3 && e->smvd_enabled)
            smvd = cabac_decode_bin(p->cab, SMVD_FLAG);
        if (smvd) {
            /* symmetric MVD (prediction_unit_inter_b :689): one MVD,
             * mirrored onto list 1; refs are the resolved smvd pair */
            int m0x, m0y;
            code_mvd(p, &m0x, &m0y);
            int mvp0 = cabac_decode_bin(p->cab, MVP_IDX);
            int mvp1 = cabac_decode_bin(p->cab, MVP_IDX);
            int prec = PREC_QUARTER;
            if (e->amvr && (m0x || m0y))
                prec = code_amvr_precision(p);
            p->prec_amvr = prec;
            int bcw = maybe_bcw(p, l2w, l2h);
            int ref0 = e->ref_smvd_idx0, ref1 = e->ref_smvd_idx1;
            MVc mv0 = derive_mvp_cand(p, 0, ref0, ux, uy, nw, nh, mvp0, 1,
                                      prec, l2w + l2h <= 5);
            MVc mv1 = derive_mvp_cand(p, 1, ref1, ux, uy, nw, nh, mvp1, 2,
                                      prec, l2w + l2h <= 5);
            MVc d0 = {m0x, m0y, 0, 0, 0}, d1 = {-m0x, -m0y, 0, 0, 0};
            d0 = mv_change_prec(d0, prec, PREC_INTERNAL);
            d1 = mv_change_prec(d1, prec, PREC_INTERNAL);
            mv0.x += d0.x; mv0.y += d0.y;
            mv1.x += d1.x; mv1.y += d1.y;
            mv0.ref = (int8_t)ref0; mv1.ref = (int8_t)ref1;
            mv0.bcw = (int8_t)(bcw + 1); mv1.bcw = (int8_t)(bcw + 1);
            mv0.prec = (int8_t)prec; mv1.prec = (int8_t)prec;
            update_mv_ctx_b(p, mv0, mv1, ux, uy, nw, nh, 3);
            mi.dir = 3; mi.mv0 = mv0; mi.mv1 = mv1;
            c[CU_F_SMVD] = 1;
        } else if (inter_dir == 3) {
            int nb0 = e->nb_active_ref0, nb1 = e->nb_active_ref1;
            int ref0 = nb0 > 1 ? code_ref_idx(p, nb0) : nb0 - 1;
            int m0x, m0y, m1x = 0, m1y = 0;
            code_mvd(p, &m0x, &m0y);
            int mvp0 = cabac_decode_bin(p->cab, MVP_IDX);
            int ref1 = code_ref_idx1(p, nb1);
            if (!e->mvd1_zero)
                code_mvd(p, &m1x, &m1y);
            int mvp1 = cabac_decode_bin(p->cab, MVP_IDX);
            int prec = PREC_QUARTER;
            int nz = (m0x || m0y) || (!e->mvd1_zero && (m1x || m1y));
            if (e->amvr && nz)
                prec = code_amvr_precision(p);
            p->prec_amvr = prec;
            int bcw = maybe_bcw(p, l2w, l2h);
            MVc mv0 = derive_mvp_cand(p, 0, ref0, ux, uy, nw, nh, mvp0, 1,
                                      prec, l2w + l2h <= 5);
            MVc mv1 = derive_mvp_cand(p, 1, ref1, ux, uy, nw, nh, mvp1, 2,
                                      prec, l2w + l2h <= 5);
            MVc d0 = {m0x, m0y, 0, 0, 0}, d1 = {m1x, m1y, 0, 0, 0};
            d0 = mv_change_prec(d0, prec, PREC_INTERNAL);
            d1 = mv_change_prec(d1, prec, PREC_INTERNAL);
            mv0.x += d0.x; mv0.y += d0.y;
            mv1.x += d1.x; mv1.y += d1.y;
            mv0.ref = (int8_t)ref0; mv1.ref = (int8_t)ref1;
            mv0.bcw = (int8_t)(bcw + 1); mv1.bcw = (int8_t)(bcw + 1);
            mv0.prec = (int8_t)prec; mv1.prec = (int8_t)prec;
            update_mv_ctx_b(p, mv0, mv1, ux, uy, nw, nh, 3);
            mi.dir = 3; mi.mv0 = mv0; mi.mv1 = mv1;
        } else {
            int lst = inter_dir == 1 ? 0 : 1;
            int nb = lst == 0 ? e->nb_active_ref0 : e->nb_active_ref1;
            int ridx;
            if (lst == 0)
                ridx = nb > 1 ? code_ref_idx(p, nb) : nb - 1;
            else
                ridx = code_ref_idx1(p, nb);
            int mdx, mdy;
            code_mvd(p, &mdx, &mdy);
            int mvp_idx = cabac_decode_bin(p->cab, MVP_IDX);
            int prec = PREC_QUARTER;
            if (e->amvr && (mdx || mdy))
                prec = code_amvr_precision(p);
            p->prec_amvr = prec;
            MVc mv = derive_mvp_cand(p, lst, ridx, ux, uy, nw, nh, mvp_idx,
                                     inter_dir, prec, l2w + l2h <= 5);
            MVc d = {mdx, mdy, 0, 0, 0};
            d = mv_change_prec(d, prec, PREC_INTERNAL);
            mv.x += d.x; mv.y += d.y;
            mv.ref = (int8_t)ridx;
            mv.bcw = 3;
            mv.prec = (int8_t)prec;
            /* drv_mvp_b with mvd0 for both: the unused list keeps MV() */
            MVc z = {0, 0, 0, 0, 0};
            MVc mv0 = lst == 0 ? mv : z;
            MVc mv1 = lst == 1 ? mv : z;
            update_mv_ctx_b(p, mv0, mv1, ux, uy, nw, nh, inter_dir);
            mi.dir = inter_dir; mi.mv0 = mv0; mi.mv1 = mv1;
        }
    }
    c[CU_F_MV0X] = mi.mv0.x;
    c[CU_F_MV0Y] = mi.mv0.y;
    c[CU_F_MV0REF] = (mi.dir & 1) ? mi.mv0.ref : -1;
    c[CU_F_MV0BCW] = mi.mv0.bcw;
    c[CU_F_MV0PREC] = mi.mv0.prec;
    c[CU_F_MV1X] = mi.mv1.x;
    c[CU_F_MV1Y] = mi.mv1.y;
    c[CU_F_MV1REF] = (mi.dir & 2) ? mi.mv1.ref : -1;
    c[CU_F_INTER_DIR] = mi.dir;
    c[CU_F_PRED] = MODE_INTER;
    (void)skip;
}

/* ---- per-CU shared head/tail (slice_data.py) ------------------------- */
static void dqp_group_start(Pc *p, int x0, int y0)
{
    const EntryParams *e = p->ep;
    if (!e->cu_qp_delta_enabled) return;
    int min_cb = e->l_min_cb;
    int ctb_mask = (1 << e->log2_ctb) - 1;
    int x0l = x0 & ctb_mask, y0l = y0 & ctb_mask;
    int msk = (1 << (e->log2_ctb + 1 - e->cu_qp_delta_subdiv)) - 1;
    if (!((x0l & msk) | (y0l & msk))) {
        int abv = y0l ? p->qp_map_x[(x0l & ~msk) >> min_cb] : p->qp;
        int lft = x0l ? p->qp_map_y[(y0l & ~msk) >> min_cb] : p->qp;
        p->qp = (abv + lft + 1) >> 1;
        p->is_qp_delta_coded = 0;
    }
}

static void qp_maps_update(Pc *p, int x0, int y0, int l2w, int l2h)
{
    const EntryParams *e = p->ep;
    if (!e->cu_qp_delta_enabled) return;
    int min_cb = e->l_min_cb;
    int ctb_mask = (1 << e->log2_ctb) - 1;
    int x0l = x0 & ctb_mask, y0l = y0 & ctb_mask;
    for (int i = 0; i < (1 << l2w) >> min_cb; i++)
        p->qp_map_x[(x0l >> min_cb) + i] = p->qp;
    for (int i = 0; i < (1 << l2h) >> min_cb; i++)
        p->qp_map_y[(y0l >> min_cb) + i] = p->qp;
}

static void cu_tail_maps(Pc *p, int64_t cui, int cu_type)
{
    int32_t *c = cu_rec(p, cui);
    map_fill(p, p->m_ctype, c[CU_F_X0], c[CU_F_Y0], c[CU_F_LOG2W],
             c[CU_F_LOG2H], cu_type);
    c[CU_F_QP] = p->qp;
    qp_maps_update(p, c[CU_F_X0], c[CU_F_Y0], c[CU_F_LOG2W], c[CU_F_LOG2H]);
    c[CU_F_NTU] = (int32_t)(p->ntu - c[CU_F_TU0]);
    p->ctu_ncu[p->cur_ctu * 3 + 2] += 1;
}

/* intra CU body shared by I-slice dispatch and intra-in-P */
static void cu_intra_body(Pc *p, int64_t cui)
{
    const EntryParams *e = p->ep;
    int32_t *c = cu_rec(p, cui);
    int x0 = c[CU_F_X0], y0 = c[CU_F_Y0];
    int l2w = c[CU_F_LOG2W], l2h = c[CU_F_LOG2H];

    cu_intra_luma(p, c);
    store_cu_luma(p, c);
    map_fill(p, p->m_ctype, x0, y0, l2w, l2h,
             c[CU_F_MIP_FLAG] ? CU_MIP : CU_INTRA);

    if (e->chroma_enabled) {
        int col_mode = c[CU_F_MIP_FLAG] ? INTRA_PLANAR : c[CU_F_INTRA_L];
        c[CU_F_COL_MODE] = col_mode;
        cu_intra_chroma(p, c, col_mode);
    }

    TuInfo info;
    transform_tree_c(p, cui, x0, y0, l2w, l2h, 0, 0, &info);
    c = cu_rec(p, cui); /* record pointer is stable (flat buffer) */
    lfnst_mts_idx_c(p, cui, l2w, l2h, &info);

    if (e->chroma_enabled)
        store_cu_chroma(p, x0 >> 1, y0 >> 1, l2w, l2h);
}

/* root cbf + inter transform tree (slice_data._inter_tu_tail, SBT off) */
static void inter_tu_tail(Pc *p, int64_t cui, int x0, int y0, int l2w, int l2h)
{
    int32_t *c = cu_rec(p, cui);
    int root = c[CU_F_MERGE_FLAG] ? 1 : cabac_decode_bin(p->cab, QT_ROOT_CBF);
    c[CU_F_ROOT_CBF] = root;
    if (root) {
        TuInfo info;
        transform_tree_c(p, cui, x0, y0, l2w, l2h, 0, 1, &info);
    }
}

/* ---- CU dispatch (slice_data.py coding_unit_dispatch) ---------------- */
static void coding_unit_dispatch(Pc *p, int x0, int y0, int l2w, int l2h)
{
    const EntryParams *e = p->ep;

    if (e->slice_type != 2) { /* P or B slice */
        int64_t cui = new_cu(p, x0, y0, l2w, l2h);
        int32_t *c = cu_rec(p, cui);
        c[CU_F_PRED] = MODE_INTER;

        dqp_group_start(p, x0, y0);
        c[CU_F_QP] = p->qp;

        int abv = nbr_u8(p, p->m_ctype, x0, y0 - 1, CU_NA);
        int lft = nbr_u8(p, p->m_ctype, x0 - 1, y0, CU_NA);
        int off = (abv == CU_INTER_SKIP || abv == CU_INTER_SKIP_AFF ||
                   abv == CU_IBC_SKIP) +
                  (lft == CU_INTER_SKIP || lft == CU_INTER_SKIP_AFF ||
                   lft == CU_IBC_SKIP);
        int skip = cabac_decode_bin(p->cab, SKIP_FLAG + off);
        c[CU_F_SKIP] = skip;

        if (skip) {
            c[CU_F_MERGE_FLAG] = 1;
            if (e->slice_type == 0)
                pred_unit_inter_b(p, c, x0, y0, l2w, l2h, 1, 1);
            else
                pred_unit_inter_p(p, c, x0, y0, l2w, l2h, 1, 1);
            c[CU_F_PREC_EFF] = p->prec_amvr;
            reset_intra_map(p, x0, y0, l2w, l2h);
            cu_tail_maps(p, cui, c[CU_F_SB_FLAG] ? CU_INTER_SKIP_AFF
                                                 : CU_INTER_SKIP);
            return;
        }

        if (l2w == 2 && l2h == 2)
            bail(p, ERR_UNSUPPORTED); /* implies SCIPU share */

        int pm_off = (abv == CU_INTRA || abv == CU_MIP ||
                      lft == CU_INTRA || lft == CU_MIP);
        int pred_intra = cabac_decode_bin(p->cab, PRED_MODE + pm_off);

        if (pred_intra) {
            c[CU_F_PRED] = MODE_INTRA;
            cu_intra_body(p, cui);
            c = cu_rec(p, cui);
            cu_tail_maps(p, cui, c[CU_F_MIP_FLAG] ? CU_MIP : CU_INTRA);
            return;
        }

        c[CU_F_MERGE_FLAG] = cabac_decode_bin(p->cab, MERGE_FLAG);
        if (e->slice_type == 0)
            pred_unit_inter_b(p, c, x0, y0, l2w, l2h, 0, c[CU_F_MERGE_FLAG]);
        else
            pred_unit_inter_p(p, c, x0, y0, l2w, l2h, 0, c[CU_F_MERGE_FLAG]);
        c[CU_F_PREC_EFF] = p->prec_amvr;
        reset_intra_map(p, x0, y0, l2w, l2h);
        inter_tu_tail(p, cui, x0, y0, l2w, l2h);
        if (e->chroma_enabled)
            store_cu_chroma(p, x0 >> 1, y0 >> 1, l2w, l2h);
        store_cu_luma(p, cu_rec(p, cui));
        cu_tail_maps(p, cui, cu_rec(p, cui)[CU_F_SB_FLAG] ? CU_AFFINE
                                                          : CU_INTER);
        return;
    }

    /* I slice, single tree (dual tree / IBC pre-gated off) */
    int64_t cui = new_cu(p, x0, y0, l2w, l2h);
    dqp_group_start(p, x0, y0);
    cu_rec(p, cui)[CU_F_QP] = p->qp;
    cu_intra_body(p, cui);
    int32_t *c = cu_rec(p, cui);
    /* I-slice dispatch tail: qp maps + IR append (ctype set in body) */
    c[CU_F_QP] = p->qp;
    qp_maps_update(p, x0, y0, l2w, l2h);
    c[CU_F_NTU] = (int32_t)(p->ntu - c[CU_F_TU0]);
    p->ctu_ncu[p->cur_ctu * 3 + 2] += 1;
}

/* ---- coding tree (vcl/coding_tree.py parity, single tree) ------------ */
static void coding_quadtree(Pc *p, int x0, int y0, int l2s, int qt_depth);
static void multi_type_tree(Pc *p, int x0, int y0, int l2w, int l2h,
                            int mtt_depth, int middle_tt, int imp_depth);

static int read_split_cu_flag(Pc *p, int x0, int y0, int l2w, int l2h,
                              int nb_split_cand)
{
    int abv = nbr_u8(p, p->m_log2w, x0, y0 - 1, UNAVAIL);
    int lft = nbr_u8(p, p->m_log2h, x0 - 1, y0, UNAVAIL);
    int off = (lft < l2h) + (abv < l2w) + (nb_split_cand >> 1) * 3;
    return cabac_decode_bin(p->cab, SPLIT_FLAG + off);
}

static int read_split_qt_flag(Pc *p, int x0, int y0, int qt_depth)
{
    int d_abv = in_tile(p, x0, y0 - 1)
                    ? MAPAT(p->m_qtd, p, lu_x(p, x0), lu_y(p, y0 - 1)) : 0;
    int d_lft = in_tile(p, x0 - 1, y0)
                    ? MAPAT(p->m_qtd, p, lu_x(p, x0 - 1), lu_y(p, y0)) : 0;
    int off = (d_lft > qt_depth) + (d_abv > qt_depth) + (qt_depth < 2 ? 0 : 3);
    return cabac_decode_bin(p->cab, SPLIT_QT_FLAG + off);
}

static int read_mtt_vertical_flag(Pc *p, int x0, int y0, int l2w, int l2h,
                                  int nb_v, int nb_h)
{
    int abv = nbr_u8(p, p->m_log2w, x0, y0 - 1, UNAVAIL);
    int lft = nbr_u8(p, p->m_log2h, x0 - 1, y0, UNAVAIL);
    int cx;
    if (nb_v == nb_h) {
        int w_ratio = (1 << l2w) >> (abv & 0x7);
        int h_ratio = (1 << l2h) >> (lft & 0x7);
        if (w_ratio == h_ratio || abv == UNAVAIL || lft == UNAVAIL)
            cx = 0;
        else if (w_ratio < h_ratio)
            cx = 1;
        else
            cx = 2;
    } else {
        cx = nb_v < nb_h ? 3 : 4;
    }
    return cabac_decode_bin(p->cab, SPLIT_HV_FLAG + cx);
}

static int read_mtt_binary_flag(Pc *p, int mtt_depth, int vertical)
{
    int cx = (vertical << 1) | (mtt_depth <= 1 ? 1 : 0);
    return cabac_decode_bin(p->cab, SPLIT12_FLAG + cx);
}

/* _separate_trees: any SCIPU outcome is unsupported in the native path */
static void check_scipu(Pc *p, int child_luma_area, int narrow_chroma)
{
    if (p->share || p->tree_type != TREE_SINGLE)
        return;
    int chroma_area = child_luma_area >> 2;
    if (chroma_area >= 16 && !narrow_chroma)
        return;
    bail(p, ERR_UNSUPPORTED);
}

static void bt_split(Pc *p, int x0, int y0, int l2w, int l2h, int mtt_depth,
                     int imp_depth, int vertical)
{
    check_scipu(p, 1 << (l2w + l2h - 1), vertical && l2w == 3);
    int nl2w = vertical ? l2w - 1 : l2w;
    int nl2h = vertical ? l2h : l2h - 1;
    int x1 = vertical ? x0 + (1 << nl2w) : x0;
    int y1 = vertical ? y0 : y0 + (1 << nl2h);
    multi_type_tree(p, x0, y0, nl2w, nl2h, mtt_depth + 1, 0, imp_depth);
    multi_type_tree(p, x1, y1, nl2w, nl2h, mtt_depth + 1, 0, imp_depth);
}

static void tt_split(Pc *p, int x0, int y0, int l2w, int l2h, int mtt_depth,
                     int imp_depth, int vertical)
{
    check_scipu(p, 1 << (l2w + l2h - 2), vertical && l2w == 4);
    int middle = vertical ? 1 : 2;
    if (vertical) {
        int l2w1 = l2w - 2, l2w2 = l2w - 1;
        int x1 = x0 + (1 << l2w1), x2 = x1 + (1 << l2w2);
        multi_type_tree(p, x0, y0, l2w1, l2h, mtt_depth + 1, 0, imp_depth);
        multi_type_tree(p, x1, y0, l2w2, l2h, mtt_depth + 1, middle, imp_depth);
        multi_type_tree(p, x2, y0, l2w1, l2h, mtt_depth + 1, 0, imp_depth);
    } else {
        int l2h1 = l2h - 2, l2h2 = l2h - 1;
        int y1 = y0 + (1 << l2h1), y2 = y1 + (1 << l2h2);
        multi_type_tree(p, x0, y0, l2w, l2h1, mtt_depth + 1, 0, imp_depth);
        multi_type_tree(p, x0, y1, l2w, l2h2, mtt_depth + 1, middle, imp_depth);
        multi_type_tree(p, x0, y2, l2w, l2h1, mtt_depth + 1, 0, imp_depth);
    }
}

static void multi_type_tree(Pc *p, int x0, int y0, int l2w, int l2h,
                            int mtt_depth, int middle_tt, int imp_depth)
{
    const EntryParams *e = p->ep;
    int max_mtt = e->l_mtt_depth, max_tt = e->l_max_tt, max_bt = e->l_max_bt;
    int min_cb = e->l_min_cb;

    int can_split = (mtt_depth - imp_depth) < max_mtt;
    int allow_tt_v = 0, allow_tt_h = 0, allow_bt_v = 0, allow_bt_h = 0;
    if (can_split) {
        int allow_tt = l2w <= max_tt && l2h <= max_tt && l2w <= 6 && l2h <= 6;
        allow_tt_v = allow_tt && (l2w - 1) > min_cb;
        allow_tt_h = allow_tt && (l2h - 1) > min_cb;
        allow_bt_v = min_cb < l2w && l2w <= max_bt && middle_tt != 1;
        allow_bt_h = min_cb < l2h && l2h <= max_bt && middle_tt != 2;
        if (l2h + l2w <= 4) { allow_bt_v = 0; allow_bt_h = 0; }
        if (l2h + l2w - 1 <= 4) { allow_tt_v = 0; allow_tt_h = 0; }
        if (l2h > 6 && l2w <= 6) allow_bt_v = 0;
        if (l2w > 6 && l2h <= 6) allow_bt_h = 0;
        if (l2w > max_bt || l2h > max_bt) { allow_bt_v = 0; allow_bt_h = 0; }
        can_split = allow_bt_v || allow_bt_h || allow_tt_v || allow_tt_h;
    }

    if (can_split) {
        int split_cu;
        if (mtt_depth == 0) {
            split_cu = 1; /* consumed by the QT stage */
        } else {
            int nb = allow_bt_v + allow_bt_h + allow_tt_v + allow_tt_h - 1;
            split_cu = read_split_cu_flag(p, x0, y0, l2w, l2h, nb);
        }
        if (split_cu) {
            int can_v = allow_tt_v || allow_bt_v;
            int can_h = allow_tt_h || allow_bt_h;
            int vertical;
            if (can_v && can_h)
                vertical = read_mtt_vertical_flag(p, x0, y0, l2w, l2h,
                                                  allow_bt_v + allow_tt_v,
                                                  allow_bt_h + allow_tt_h);
            else
                vertical = can_v ? 1 : 0;
            int is_bt;
            if ((vertical && allow_tt_v && allow_bt_v) ||
                (!vertical && allow_tt_h && allow_bt_h))
                is_bt = read_mtt_binary_flag(p, mtt_depth, vertical);
            else
                is_bt = vertical ? allow_bt_v : allow_bt_h;
            if (is_bt)
                bt_split(p, x0, y0, l2w, l2h, mtt_depth, imp_depth, vertical);
            else
                tt_split(p, x0, y0, l2w, l2h, mtt_depth, imp_depth, vertical);
            return;
        }
    }
    coding_unit_dispatch(p, x0, y0, l2w, l2h);
}

static void binary_tree_implicit(Pc *p, int x0, int y0, int l2w, int l2h,
                                 int mtt_depth, int vertical)
{
    const EntryParams *e = p->ep;
    int implicit = vertical ? x0 + (1 << l2w) > e->pic_w
                            : y0 + (1 << l2h) > e->pic_h;
    if (!implicit) {
        multi_type_tree(p, x0, y0, l2w, l2h, mtt_depth, 0, mtt_depth);
        return;
    }
    int nl2w = vertical ? l2w - 1 : l2w;
    int nl2h = vertical ? l2h : l2h - 1;
    int x1 = vertical ? x0 + (1 << nl2w) : x0;
    int y1 = vertical ? y0 : y0 + (1 << nl2h);
    int first_fits = vertical ? x1 <= e->pic_w : y1 <= e->pic_h;
    int second_exists = vertical ? x1 < e->pic_w : y1 < e->pic_h;
    if (first_fits)
        multi_type_tree(p, x0, y0, nl2w, nl2h, mtt_depth + 1, 0,
                        mtt_depth + 1);
    else
        binary_tree_implicit(p, x0, y0, nl2w, nl2h, mtt_depth + 1, vertical);
    if (second_exists)
        binary_tree_implicit(p, x1, y1, nl2w, nl2h, mtt_depth + 1, vertical);
}

static void coding_quadtree_implicit(Pc *p, int x0, int y0, int l2s,
                                     int qt_depth)
{
    const EntryParams *e = p->ep;
    int x_end = x0 + (1 << l2s), y_end = y0 + (1 << l2s);
    int allow_qt = l2s > e->l_min_qt;
    int allow_bt = l2s <= e->l_max_bt && l2s <= 6 && e->l_mtt_depth > 0;
    allow_qt = allow_qt || !allow_bt;
    int force_qt = x_end > e->pic_w && y_end > e->pic_h;

    int split_qt = allow_qt;
    if (allow_bt && !force_qt && allow_qt)
        split_qt = read_split_qt_flag(p, x0, y0, qt_depth);

    if (split_qt) {
        int half = 1 << (l2s - 1);
        int x1 = x0 + half, y1 = y0 + half;
        coding_quadtree(p, x0, y0, l2s - 1, qt_depth + 1);
        if (x1 < e->pic_w)
            coding_quadtree(p, x1, y0, l2s - 1, qt_depth + 1);
        if (y1 < e->pic_h)
            coding_quadtree(p, x0, y1, l2s - 1, qt_depth + 1);
        if (x1 < e->pic_w && y1 < e->pic_h)
            coding_quadtree(p, x1, y1, l2s - 1, qt_depth + 1);
        return;
    }

    store_qt_depth_luma(p, x0, y0, l2s, qt_depth);
    binary_tree_implicit(p, x0, y0, l2s, l2s, 0, x_end > e->pic_w);
}

static void coding_quadtree(Pc *p, int x0, int y0, int l2s, int qt_depth)
{
    const EntryParams *e = p->ep;
    if (x0 + (1 << l2s) > e->pic_w || y0 + (1 << l2s) > e->pic_h) {
        coding_quadtree_implicit(p, x0, y0, l2s, qt_depth);
        return;
    }

    int allow_qt = l2s > e->l_min_qt && l2s > e->l_min_cb && l2s > 2;
    int allow_bt = l2s <= e->l_max_bt && e->l_mtt_depth > 0 &&
                   l2s > e->l_min_cb && l2s > 2;
    int allow_tt = l2s <= e->l_max_tt && e->l_mtt_depth > 0 &&
                   (l2s - 1) > e->l_min_cb && l2s > 2;

    int split_cu = 0;
    if (allow_qt || allow_bt || allow_tt) {
        int nb = (allow_tt << 1) + (allow_bt << 1) + (allow_qt << 1) - 1;
        split_cu = read_split_cu_flag(p, x0, y0, l2s, l2s, nb);
    }

    if (split_cu) {
        int split_qt = allow_qt;
        if (allow_qt && (allow_bt || allow_tt))
            split_qt = read_split_qt_flag(p, x0, y0, qt_depth);
        if (split_qt) {
            check_scipu(p, 1 << (2 * l2s - 2), 0);
            int half = 1 << (l2s - 1);
            coding_quadtree(p, x0, y0, l2s - 1, qt_depth + 1);
            coding_quadtree(p, x0 + half, y0, l2s - 1, qt_depth + 1);
            coding_quadtree(p, x0, y0 + half, l2s - 1, qt_depth + 1);
            coding_quadtree(p, x0 + half, y0 + half, l2s - 1, qt_depth + 1);
            return;
        }
        store_qt_depth_luma(p, x0, y0, l2s, qt_depth);
        multi_type_tree(p, x0, y0, l2s, l2s, 0, 0, 0);
        return;
    }

    coding_unit_dispatch(p, x0, y0, l2s, l2s);
    store_qt_depth_luma(p, x0, y0, l2s, qt_depth);
}

/* ---- SAO per-CTU syntax (vcl/sao.py parity) -------------------------- */
#define SAO_NONE 0
#define SAO_BAND 1
#define SAO_EDGE 2

/* record layout: [type0..2][val 3*5][band 3][eo 3] = 24 ints */
static void sao_comp_params(Pc *p, int32_t *rec, int c, int n_bits,
                            int parse_type, int shared_type)
{
    int32_t *type = rec;
    int32_t *val = rec + 3;
    int32_t *band = rec + 18;
    int32_t *eo = rec + 21;

    if (parse_type)
        type[c] = cabac_decode_bypass(p->cab) ? SAO_EDGE : SAO_BAND;
    else
        type[c] = shared_type;

    int offs[4];
    for (int i = 0; i < 4; i++) {
        int k = 0;
        while (k < n_bits && cabac_decode_bypass(p->cab))
            k += 1;
        offs[i] = k;
    }

    if (type[c] == SAO_BAND) {
        for (int k = 0; k < 4; k++) {
            int s = offs[k] ? cabac_decode_bypass(p->cab) : 0;
            val[c * 5 + k] = s ? -offs[k] : offs[k];
        }
        val[c * 5 + 4] = 0;
        int bp = 0;
        for (int i = 1; i <= 5; i++)
            bp |= cabac_decode_bypass(p->cab) << (5 - i);
        band[c] = bp;
    } else { /* edge */
        if (c != 2)
            eo[c] = (cabac_decode_bypass(p->cab) << 1) |
                    cabac_decode_bypass(p->cab);
        else
            eo[2] = eo[1];
        val[c * 5 + 0] = offs[0];
        val[c * 5 + 1] = offs[1];
        val[c * 5 + 2] = 0;
        val[c * 5 + 3] = -offs[2];
        val[c * 5 + 4] = -offs[3];
    }
}

static void code_sao_ctu(Pc *p, int ctb_col, int ctb_row)
{
    const EntryParams *e = p->ep;
    if (!(e->sao_luma || e->sao_chroma))
        return;
    int32_t *rec = p->sao_buf + p->cur_ctu * CTU_REC_NFIELDS;
    int left_ok = ctb_col > 0;
    int up_ok = ctb_row > 0;

    int merge = 0;
    if (left_ok)
        merge = cabac_decode_bin(p->cab, SAO_MERGE_FLAG);
    if (!merge && up_ok)
        merge = cabac_decode_bin(p->cab, SAO_MERGE_FLAG) << 1;

    if (merge == 1) {
        memcpy(rec, p->sao_buf + (p->cur_ctu - 1) * CTU_REC_NFIELDS,
               SAO_NFIELDS * sizeof(int32_t));
        return;
    }
    if (merge == 2) {
        /* the CTU one row up: rows are dense within the entry grid */
        memcpy(rec, p->sao_buf + (p->cur_ctu - e->nb_ctu_w) * CTU_REC_NFIELDS,
               SAO_NFIELDS * sizeof(int32_t));
        return;
    }

    int bd_m8 = e->bitdepth - 8;
    int n_bits = (0x1F >> ((bd_m8 <= 1) + (bd_m8 == 0))) | 0x7;

    if (e->sao_luma) {
        if (cabac_decode_bin(p->cab, SAO_TYPE_IDX))
            sao_comp_params(p, rec, 0, n_bits, 1, 0);
        else
            rec[0] = SAO_NONE;
    }
    if (e->sao_chroma) {
        if (cabac_decode_bin(p->cab, SAO_TYPE_IDX)) {
            sao_comp_params(p, rec, 1, n_bits, 1, 0);
            sao_comp_params(p, rec, 2, n_bits, 0, rec[1]);
        } else {
            rec[1] = SAO_NONE;
            rec[2] = SAO_NONE;
        }
    }
}


/* ---- ALF / CC-ALF per-CTU syntax (vcl/alf.py parity) ----------------- */
static int read_truncated(CabacDec *d, int max_symbol)
{
    /* vvc_get_cabac_truncated (cabac_internal.h:164) */
    int threshold = 0, v = max_symbol;
    while (v > 1) { v >>= 1; threshold += 1; }
    int val = 1 << threshold;
    int b = max_symbol - val;
    int sym = 0;
    for (int i = 0; i < threshold; i++)
        sym = (sym << 1) | cabac_decode_bypass(d);
    if (sym >= val - b) {
        sym = (sym << 1) | cabac_decode_bypass(d);
        sym -= val - b;
    }
    return sym;
}

static void code_alf_ctu(Pc *p, int col, int row)
{
    const EntryParams *e = p->ep;
    if (!(e->alf_luma || e->alf_cb || e->alf_cr))
        return;
    int left_ok = col > 0, up_ok = row > 0;
    int left = left_ok ? p->alf_left_flag : 0;
    int up = up_ok ? p->alf_line[col] : 0;
    int ret_luma = 0, ret_cb = 0, ret_cr = 0;
    int alf_idx = 0, cb_alt = 0, cr_alt = 0;
    if (e->alf_luma) {
        int c = (left_ok ? ((left >> 2) & 1) : 0)
              + (up_ok ? ((up >> 2) & 1) : 0);
        ret_luma = cabac_decode_bin(p->cab, CTB_ALF_FLAG + c);
        if (ret_luma) {
            int n_aps = e->num_alf_aps_luma;
            if (n_aps && cabac_decode_bin(p->cab, ALF_USE_TEMPORAL_FILT)) {
                alf_idx = n_aps > 1 ? read_truncated(p->cab, n_aps) : 0;
                alf_idx += 16; /* NUM_FIXED_FILTER_SETS */
            } else {
                alf_idx = read_truncated(p->cab, 16);
            }
        }
    }
    if (e->alf_cb) {
        int c = (left_ok ? ((left >> 1) & 1) : 0)
              + (up_ok ? ((up >> 1) & 1) : 0);
        ret_cb = cabac_decode_bin(p->cab, CTB_ALF_FLAG + 3 + c);
        while (ret_cb && cb_alt < e->alf_chroma_num_alts - 1 &&
               cabac_decode_bin(p->cab, CTB_ALF_ALTERNATIVE))
            cb_alt += 1;
    }
    if (e->alf_cr) {
        int c = (left_ok ? (left & 1) : 0) + (up_ok ? (up & 1) : 0);
        ret_cr = cabac_decode_bin(p->cab, CTB_ALF_FLAG + 6 + c);
        while (ret_cr && cr_alt < e->alf_chroma_num_alts - 1 &&
               cabac_decode_bin(p->cab, CTB_ALF_ALTERNATIVE + 1))
            cr_alt += 1;
    }
    int ret = (ret_luma << 2) | (ret_cb << 1) | ret_cr;
    p->alf_left_flag = ret;
    p->alf_line[col] = (uint8_t)ret;
    int32_t *rec = p->sao_buf + p->cur_ctu * CTU_REC_NFIELDS + SAO_NFIELDS;
    rec[0] = ret;
    rec[1] = alf_idx;
    rec[2] = cb_alt;
    rec[3] = cr_alt;
}

static void code_cc_alf_ctu(Pc *p, int col, int row)
{
    const EntryParams *e = p->ep;
    if (!(e->cc_cb_enabled || e->cc_cr_enabled))
        return;
    int left_ok = col > 0, up_ok = row > 0;
    int32_t *rec = p->sao_buf + p->cur_ctu * CTU_REC_NFIELDS + SAO_NFIELDS;
    const int flags[2] = { e->cc_cb_enabled, e->cc_cr_enabled };
    const int nf[2] = { e->cc_nb_cb, e->cc_nb_cr };
    for (int comp = 0; comp < 2; comp++) {
        if (!flags[comp]) {
            rec[4 + comp] = 0;
            continue;
        }
        int lf = left_ok ? p->cc_left[comp] : 0;
        int uf = up_ok ? p->cc_line[comp][col] : 0;
        int c = ((left_ok && lf) ? 1 : 0) + ((up_ok && uf) ? 1 : 0)
              + (comp == 1 ? 3 : 0);
        int v = cabac_decode_bin(p->cab, CC_ALF_FILTER_CONTROL_FLAG + c);
        if (v) {
            while (v != nf[comp] && cabac_decode_bypass(p->cab))
                v += 1;
        }
        rec[4 + comp] = v;
        p->cc_left[comp] = v;
        p->cc_line[comp][col] = (uint8_t)v;
    }
}

/* ---- entry driver (slice_data.py code_entry parity) ------------------ */
int64_t ov_parse_entry(const uint8_t *data, int64_t nbytes,
                       const EntryParams *ep,
                       const uint16_t *s0, const uint16_t *s1,
                       const uint8_t *r0, const uint8_t *r1,
                       const int8_t *cqp_tab,
                       int32_t *cu_buf, int64_t cu_cap,
                       int32_t *tu_buf, int64_t tu_cap,
                       int32_t *coef_buf, int64_t coef_cap,
                       int32_t *sao_buf, int32_t *ctu_meta,
                       uint8_t *tmvp_dir0, int32_t *tmvp_mv0,
                       uint8_t *tmvp_dir1, int32_t *tmvp_mv1,
                       const uint8_t *col_dir0, const uint8_t *col_dir1,
                       const int32_t *col_mv0, const int32_t *col_mv1,
                       int32_t *sub_mv, int64_t *out_counts)
{
    Pc pc;
    memset(&pc, 0, sizeof(pc));
    Pc *p = &pc;
    p->ep = ep;
    g_cqp_tab = cqp_tab;

    p->uw = (ep->tile_w + 3) >> 2;
    p->uh = (ep->tile_h + 3) >> 2;
    p->cw = ep->chroma_enabled ? ((ep->tile_w / 2 + 3) >> 2) : 1;
    p->ch = ep->chroma_enabled ? ((ep->tile_h / 2 + 3) >> 2) : 1;
    p->uw8 = (p->uw + 1) >> 1;
    p->uh8 = (p->uh + 1) >> 1;

    size_t un = (size_t)p->uw * p->uh;
    size_t cn = (size_t)p->cw * p->ch;
    p->m_log2w = malloc(un); p->m_log2h = malloc(un);
    p->m_qtd = calloc(un, 1);
    p->m_imode = malloc(un); p->m_pmode = malloc(un); p->m_ctype = malloc(un);
    p->cm_log2w = malloc(cn); p->cm_log2h = malloc(cn); p->cm_qtd = calloc(cn, 1);
    p->dir0 = tmvp_dir0; /* exported directly: caller pre-zeroes */
    p->dir1 = tmvp_dir1;
    p->mv0 = calloc(un, sizeof(MVc)); /* zero: mi_at reads unset cells */
    p->mv1 = calloc(un, sizeof(MVc));
    p->sub_mv = sub_mv;
    if (ep->affine_enabled || ep->sbtmvp_on) {
        p->aff_dir = calloc(un, 1);
        p->aff_idx = malloc(un * sizeof(int32_t));
        p->aff_cap = (int64_t)(un / 4) + 8;
        p->aff_pool = malloc((size_t)p->aff_cap * sizeof(AffInfoC));
        if (p->aff_idx)
            memset(p->aff_idx, 0xFF, un * sizeof(int32_t)); /* -1 */
    }
    p->alf_line = calloc((size_t)ep->nb_ctu_w, 1);
    p->cc_line[0] = calloc((size_t)ep->nb_ctu_w, 1);
    p->cc_line[1] = calloc((size_t)ep->nb_ctu_w, 1);
    p->tmv0 = tmvp_mv0;
    p->tmv1 = tmvp_mv1;
    p->col_dir0 = col_dir0;
    p->col_dir1 = col_dir1;
    p->col_mv0 = col_mv0;
    p->col_mv1 = col_mv1;
    int alloc_fail = !(p->m_log2w && p->m_log2h && p->m_qtd && p->m_imode &&
                       p->m_pmode && p->m_ctype && p->cm_log2w &&
                       p->cm_log2h && p->cm_qtd && p->mv0 && p->mv1 &&
                       p->alf_line && p->cc_line[0] && p->cc_line[1]);
    if (ep->affine_enabled || ep->sbtmvp_on)
        alloc_fail |= !(p->aff_dir && p->aff_idx && p->aff_pool);

    p->cu_buf = cu_buf; p->cu_cap = cu_cap;
    p->tu_buf = tu_buf; p->tu_cap = tu_cap;
    p->coef = coef_buf; p->coef_cap = coef_cap;
    p->sao_buf = sao_buf;
    p->ctu_ncu = ctu_meta;

    int64_t ret = 0;
    CabacDec *cab = NULL;
    int jmp;
    if (alloc_fail) {
        ret = ERR_OVERFLOW;
    } else if ((jmp = setjmp(p->env)) != 0) {
        ret = -jmp;
        out_counts[0] = p->ncu;
        out_counts[1] = p->ntu;
        out_counts[2] = p->ncoef;
        out_counts[3] = p->cab ? cabac_bitpos(p->cab) : -1;
    } else {
        memset(p->m_log2w, UNAVAIL, un);
        memset(p->m_log2h, UNAVAIL, un);
        memset(p->m_imode, UNAVAIL, un);
        memset(p->m_pmode, UNAVAIL, un);
        memset(p->m_ctype, UNAVAIL, un);
        memset(p->cm_log2w, UNAVAIL, cn);
        memset(p->mv0, 0, un * sizeof(MVc));
        memset(p->cm_log2h, UNAVAIL, cn);
        p->qp = ep->slice_qp;
        for (int i = 0; i < 64; i++) {
            p->qp_map_x[i] = ep->slice_qp;
            p->qp_map_y[i] = ep->slice_qp;
        }
        p->tree_type = TREE_SINGLE;
        p->share = 0;
        p->slice_is_intra = ep->slice_type == 2;

        cab = cabac_new(data, nbytes, s0, s1, r0, r1);
        if (!cab) {
            ret = ERR_OVERFLOW;
        } else {
            p->cab = cab;
            int log2_ctb = ep->log2_ctb;
            int nctu = 0;
            for (int row = 0; row < ep->nb_ctu_h; row++) {
                int row_backup_qp = -1000;
                p->hmvp_n = 0; /* HMVP resets per CTU row */
                for (int col = 0; col < ep->nb_ctu_w; col++) {
                    int x0 = (ep->ctu_x + col) << log2_ctb;
                    int y0 = (ep->ctu_y + row) << log2_ctb;
                    if (x0 >= ep->pic_w || y0 >= ep->pic_h)
                        continue;
                    p->cur_ctu = nctu;
                    p->ctu_ncu[nctu * 3 + 0] = ep->ctu_x + col;
                    p->ctu_ncu[nctu * 3 + 1] = ep->ctu_y + row;
                    p->ctu_ncu[nctu * 3 + 2] = 0;
                    code_sao_ctu(p, col, row);
                    code_alf_ctu(p, col, row);
                    code_cc_alf_ctu(p, col, row);
                    coding_quadtree(p, x0, y0, log2_ctb, 0);
                    nctu += 1;
                    if (col == 0)
                        row_backup_qp = p->qp_map_x[0];
                }
                if (row_backup_qp != -1000)
                    p->qp = row_backup_qp;
            }
            if (cabac_decode_terminate(cab) != 1)
                ret = ERR_STREAM;
            else if (cabac_overread(cab))
                ret = ERR_STREAM;
            out_counts[0] = p->ncu;
            out_counts[1] = p->ntu;
            out_counts[2] = p->ncoef;
            out_counts[3] = nctu;
            if (ret == 0 && p->sub_mv) {
                /* per-unit MV export for affine/SbTMVP reconstruction */
                for (size_t u = 0; u < un; u++) {
                    p->sub_mv[u * 4 + 0] = p->mv0[u].x;
                    p->sub_mv[u * 4 + 1] = p->mv0[u].y;
                    p->sub_mv[u * 4 + 2] = p->mv1[u].x;
                    p->sub_mv[u * 4 + 3] = p->mv1[u].y;
                }
            }
        }
    }

    if (cab) cabac_free(cab);
    free(p->m_log2w); free(p->m_log2h); free(p->m_qtd);
    free(p->m_imode); free(p->m_pmode); free(p->m_ctype);
    free(p->cm_log2w); free(p->cm_log2h); free(p->cm_qtd);
    free(p->mv0);
    free(p->mv1);
    free(p->aff_dir);
    free(p->aff_idx);
    free(p->aff_pool);
    free(p->alf_line);
    free(p->cc_line[0]);
    free(p->cc_line[1]);
    return ret;
}
