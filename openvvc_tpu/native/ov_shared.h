/* Shared native definitions: IR record layouts and the parameter block
 * handed over from Python (ctypes mirrors in native/__init__.py).
 * Included by parse.c and recon.c. */
#ifndef OV_SHARED_H
#define OV_SHARED_H
#include <stdint.h>

/* ---- IR constants (vcl/ctu.py) -------------------------------------- */
#define UNAVAIL 0xFF
#define MODE_INTRA 0
#define MODE_INTER 1
#define TREE_SINGLE 0
#define INTRA_PLANAR 0
#define INTRA_DC 1
#define OV_VER 50
#define OV_HOR 18
#define OV_VDIA 66
#define INTRA_LT_CCLM 81
#define INTRA_L_CCLM 82
#define INTRA_T_CCLM 83

/* cu_utils.h CU-type map values (vcl/inter_pu.py) */
#define CU_NA 0xFF
#define CU_INTER 1
#define CU_INTRA 2
#define CU_INTER_SKIP 3
#define CU_MIP 4
#define CU_AFFINE 5
#define CU_INTER_SKIP_AFF 6
#define CU_IBC 7
#define CU_IBC_SKIP 8

#define PREC_4PEL 0
#define PREC_INT 2
#define PREC_HALF 3
#define PREC_QUARTER 4
#define PREC_INTERNAL 6

/* split kinds */
#define NO_SPLIT 0
#define QT_SPLIT 1

/* bail-out codes */
#define ERR_UNSUPPORTED (-1)
#define ERR_OVERFLOW (-2)
#define ERR_STREAM (-3)

/* ---- output record layout (must match native/__init__.py) ----------- */
enum {
    CU_F_X0, CU_F_Y0, CU_F_LOG2W, CU_F_LOG2H, CU_F_TREE, CU_F_PRED,
    CU_F_INTRA_L, CU_F_INTRA_C, CU_F_MIP_FLAG, CU_F_MIP_T, CU_F_MIP_MODE,
    CU_F_MRL, CU_F_LFNST, CU_F_SKIP, CU_F_MERGE_FLAG, CU_F_MERGE_IDX,
    CU_F_INTER_DIR, CU_F_MV0X, CU_F_MV0Y, CU_F_MV0REF, CU_F_MV0BCW,
    CU_F_MV0PREC, CU_F_MV1X, CU_F_MV1Y, CU_F_MV1REF, CU_F_QP,
    CU_F_ROOT_CBF, CU_F_PREC_EFF, CU_F_TU0, CU_F_NTU, CU_F_CTU,
    CU_F_COL_MODE,
    CU_F_CIIP_WT,   /* 0 = not CIIP; 1..3 = intra blend weight */
    CU_F_GPM_DIRS,  /* 0 = not GPM; else 1 + (dir0-1) + 2*(dir1-1) */
    CU_F_GPM_SPLIT, /* GPM split_dir 0..63 */
    CU_F_SB_FLAG,   /* 0 none; 1 affine (4x4 sub MC); 2 sbtmvp (8x8);
                       3 sbtmvp zero-fallback (whole-CU MC) */
    CU_F_PROF_DIR,  /* PROF list mask (affine only) */
    CU_F_DMV0HX, CU_F_DMV0HY, CU_F_DMV0VX, CU_F_DMV0VY, /* affine deltas */
    CU_F_DMV1HX, CU_F_DMV1HY, CU_F_DMV1VX, CU_F_DMV1VY,
    CU_F_SMVD, CU_F_MMVD, /* flags for the BDOF/DMVR enable rules */
    CU_F_BDPCM,     /* bit0 luma on, bit1 luma dir, bit2 chroma on,
                       bit3 chroma dir (pure-copy intra + TS accumulate) */
    CU_NFIELDS
};
enum {
    TU_F_COMP, TU_F_X0, TU_F_Y0, TU_F_LOG2W, TU_F_LOG2H, TU_F_CBF,
    TU_F_JCBCR, TU_F_LFNST, TU_F_MTS, TU_F_TS, TU_F_QP, TU_F_BDPCM,
    TU_F_LASTX, TU_F_LASTY, TU_F_SIGLO, TU_F_SIGHI, TU_F_COEF,
    TU_NFIELDS
};
/* device-residual TU record (VERDICT item: dequant+LFNST+itx in the frame
 * program): raw levels ship to the device; the host resolves only the
 * scalar transform selectors (rcn_dequant.c + rcn_transform.c decisions) */
enum {
    DTU_PLANE,     /* 0 y, 1 cb, 2 cr, 3 joint-CbCr */
    DTU_X, DTU_Y,  /* plane coords */
    DTU_L2W, DTU_L2H,
    DTU_QP,
    DTU_TRH, DTU_TRV,       /* 0 DCT2, 1 DST7, 2 DCT8 */
    DTU_LF_KIND,            /* 0 none, 1 4x4 (16-out), 2 8x8 (48-out) */
    DTU_LF_MAT,             /* mode_set * 2 + (lfnst_idx - 1) */
    DTU_LF_T,               /* transpose flag */
    DTU_LF_NIN,             /* 8 or 16 input coefficients */
    DTU_JC,                 /* TU_F_JCBCR value (plane 3 only) */
    DTU_CSIGN,              /* +1 / -1 joint-CbCr sign */
    DTU_COEF,               /* offset into the dtu coefficient array */
    DTU_DEPQ,               /* sh_dep_quant_used_flag for this entry */
    DTU_NFIELDS
};

#define SAO_NFIELDS 24 /* type[3], val[3][5], band_pos[3], eo_class[3] */
#define ALF_NFIELDS 6  /* ctb_alf_flag, idx, cb_alt, cr_alt, cc_cb, cc_cr */
#define CTU_REC_NFIELDS (SAO_NFIELDS + ALF_NFIELDS)

/* ---- device-IR records (tpu/intra_wave.py + tpu/frame_program.py) ---- */
enum {
    J_X0, J_Y0, J_L2W, J_L2H, J_OX, J_OY, J_MODE, J_CORNER, J_ABOVE,
    J_LEFT, J_NAVA, J_NAVL, J_LEVEL, J_KIND, J_AUX0, J_AUX1, J_NFIELDS
};
#define JOB_KIND_INTRA 0
#define JOB_KIND_CIIP 2
#define JOB_KIND_MIP 3
#define JOB_KIND_CCLM 4
/* gmask values: bit0 = MC unit; bit1 = defer the luma residual add to a
 * wave job (CIIP blend order); bit2 = defer the chroma residual add */
#define GMASK_MC 1
#define GMASK_DEFER_L 2
#define GMASK_DEFER_C 4
#define IR_TILE 32 /* intra job sub-tile (intra_wave.TILE) */

/* ---- parameters handed over from Python (ctypes.Structure) ---------- */
typedef struct {
    int32_t pic_w, pic_h, log2_ctb;
    int32_t tile_x0, tile_y0, tile_w, tile_h;
    int32_t ctu_x, ctu_y, nb_ctu_w, nb_ctu_h;
    int32_t slice_type, slice_qp, qp_bd_offset, bitdepth;
    /* partition info: luma then chroma */
    int32_t l_min_qt, l_max_bt, l_max_tt, l_mtt_depth, l_min_cb, l_max_tb;
    int32_t c_min_qt, c_max_bt, c_max_tt, c_mtt_depth, c_min_cb, c_max_tb;
    /* tools */
    int32_t chroma_enabled, cclm, cclm_colloc, mip, mrl, amvr;
    int32_t dep_quant, sign_hiding, sao_luma, sao_chroma;
    int32_t joint_cbcr, lfnst, mts, mts_implicit, expl_mts_intra, expl_mts_inter;
    int32_t cu_qp_delta_enabled, cu_qp_delta_subdiv;
    int32_t max_num_merge_cand, nb_active_ref0;
    int32_t cqp_tab_len; /* 64 + qp_bd_offset */
    int32_t cb_qp_off, cr_qp_off, jcbcr_qp_off;
    /* B slices */
    int32_t nb_active_ref1;
    int32_t mvd1_zero; /* ph_mvd_l1_zero_flag */
    int32_t rpl0_opp[16], rpl1_opp[16]; /* opposite-list ref with same POC
                                           delta, 0xFF if none */
    /* TMVP (collocated picture planes are passed as ov_parse_entry args) */
    int32_t tmvp_enabled, tmvp_ldc, col_ref_l0;
    int32_t col_uw, col_uh;   /* picture 4x4-unit grid dims */
    int32_t col_uw8, col_uh8; /* picture 8x8 MV grid dims */
    int32_t dist_ref0[16], dist_ref1[16]; /* current-slice ref distances */
    int32_t dist_col0[16], dist_col1[16]; /* collocated pic ref distances */
    /* ALF / CC-ALF slice context (vcl/ctu.py CTUParseCtx ALF state) */
    int32_t alf_luma, alf_cb, alf_cr;
    int32_t num_alf_aps_luma, alf_chroma_num_alts;
    int32_t cc_cb_enabled, cc_cr_enabled, cc_nb_cb, cc_nb_cr;
    /* MMVD / SMVD / BCW (vcl/ctu.py CTUParseCtx inter tool enables) */
    int32_t mmvd_enabled, mmvd_shift;       /* ph_mmvd_fullpel_only << 1 */
    int32_t smvd_enabled;                   /* slicedec_smvd_params resolved */
    int32_t ref_smvd_idx0, ref_smvd_idx1;
    int32_t bcw_enabled;
    int32_t ldc;                            /* InterCtx.ldc (BCW idx bits) */
    /* CIIP / GPM */
    int32_t ciip_enabled;
    int32_t gpm_enabled, max_gpm_cand;
    /* affine / SbTMVP (vcl/ctu.py :320-353) */
    int32_t affine_enabled, sbtmvp_on;      /* sbtmvp_on = sps && ph tmvp */
    int32_t affine_6param, affine_prof;     /* prof = sps && !ph disabled */
    int32_t affine_amvr, affine_nb_merge_cand;
    int32_t col_ref_idx0, col_ref_idx1;     /* SbTMVP collocated ref pair */
    int32_t nb_ctb_pic_w;
    /* BDOF / DMVR (sps flag && !ph disabled) */
    int32_t bdof_on, dmvr_on;
    /* transform skip (sps_transform_skip_enabled_flag + size/qp params) */
    int32_t ts_enabled, log2_ts_max, min_qp_prime_ts;
    int32_t bdpcm_enabled;
} EntryParams;

/* ---- deblocking maps handed over from Python (rcn/ref_dbf.py DbfMaps;
 * ctypes mirror _DbfBufsC in native/__init__.py) ---------------------- */
typedef struct {
    /* luma maps: uint8 bool (uh+1, uw+1) except qp (uh, uw) */
    uint8_t *edge_ver, *edge_hor, *bs2_ver, *bs2_hor, *bs1_ver, *bs1_hor;
    uint8_t *cu_edge_ver, *cu_edge_hor;
    int32_t *qp_l;
    uint8_t *mv_dir;   /* (uh, uw) */
    int32_t *mv_vals;  /* (uh, uw, 2, 2) */
    int32_t *mv_dist;  /* (uh, uw, 2) */
    /* chroma maps */
    uint8_t *cedge_ver, *cedge_hor, *cbs2_ver, *cbs2_hor;
    uint8_t *cbs1_cb_ver, *cbs1_cb_hor, *cbs1_cr_ver, *cbs1_cr_hor;
    int32_t *qp_cb, *qp_cr;
    /* affine / SbTMVP sub-block state */
    uint8_t *sb_edge_ver, *sb_edge_hor;
    uint8_t *aff_unit;  /* (uh, uw) */
} DbfBufs;

/* whole-frame deblocking parameters (ref_dbf.py deblock_frame) */
typedef struct {
    int32_t pic_w, pic_h, bitdepth, chroma_enabled;
    int32_t log2_ctb;
    int32_t beta_off_l, tc_off_l;
    int32_t beta_off_cb, tc_off_cb, beta_off_cr, tc_off_cr;
    int32_t nb_no_x, nb_no_y;  /* unfiltered tile-boundary coords (luma) */
    int32_t finalize_inter_bs; /* run the MV-bs pass before filtering */
} DbfFrameParams;

#endif /* OV_SHARED_H */
