"""CABAC context model layout and initialization.

The 393 adaptive contexts follow VTM's ContextSetCfg aggregation order (the
same layout as the reference's SyntaxElemOffset enum,
/root/reference/libovvc/vcl_cabac.h:45-132). Initialization implements
ITU-T H.266 section 9.3.2.2: dual probability states pStateIdx0 (10-bit) and
pStateIdx1 (14-bit) with per-context adaptation shifts derived from the rate
table.
"""

from __future__ import annotations

import enum

from openvvc_tpu.cabac.data_ctx_init import (
    INIT_VALUES_B,
    INIT_VALUES_I,
    INIT_VALUES_P,
    NB_CTX,
    RATE_INIT,
)


class CtxOffset(enum.IntEnum):
    """Offset of each syntax element's first context in the context table."""

    SPLIT_FLAG = 0
    SPLIT_QT_FLAG = 9
    SPLIT_HV_FLAG = 15
    SPLIT12_FLAG = 20
    MODE_CONS_FLAG = 24
    SKIP_FLAG = 26
    MERGE_FLAG = 29
    REGULAR_MERGE_FLAG = 30
    MERGE_IDX = 32
    MMVD_FLAG = 33
    MMVD_MERGE_IDX = 34
    MMVD_STEP_MVP_IDX = 35
    PRED_MODE = 36
    MULTI_REF_LINE_IDX = 38
    INTRA_LUMA_MPM_FLAG = 40
    INTRA_LUMA_PLANAR_FLAG = 41
    CCLM_MODE_FLAG = 43
    CCLM_MODE_IDX = 44
    INTRA_CHROMA_PRED_MODE = 45
    MIP_FLAG = 46
    DELTA_QP = 50
    INTER_DIR = 52
    REF_PIC = 58
    SUBBLOCK_MERGE_FLAG = 60
    AFFINE_FLAG = 63
    AFFINE_TYPE = 66
    AFF_MERGE_IDX = 67
    BCW_IDX = 68
    MVD = 69
    BDPCM_MODE = 71
    QT_ROOT_CBF = 75
    ACT_FLAG = 76
    QT_CBF = 77
    QT_CBF_CB = 81
    QT_CBF_CR = 83
    SIG_COEFF_GROUP = 86
    SIG_COEFF_GROUP_C = 88
    SIG_FLAG = 90
    SIG_FLAG_C = 126
    PAR_FLAG = 150
    PAR_FLAG_C = 171
    GT1_FLAG = 182
    GT1_FLAG_C = 203
    GT0_FLAG = 214
    GT0_FLAG_C = 235
    LAST_X = 246
    LAST_X_C = 266
    LAST_Y = 269
    LAST_Y_C = 289
    MVP_IDX = 292
    SMVD_FLAG = 293
    SAO_MERGE_FLAG = 294
    SAO_TYPE_IDX = 295
    LFNST_IDX = 296
    PLT_FLAG = 299
    ROTATION_FLAG = 300
    RUN_TYPE_FLAG = 301
    IDX_RUN_MODEL = 302
    COPY_RUN_MODEL = 307
    RDPCM_FLAG = 310
    RDPCM_DIR = 312
    TRANSFORM_SKIP_FLAG = 314
    MTS_IDX = 316
    ISP_MODE = 320
    SBT_FLAG = 322
    SBT_QUAD_FLAG = 324
    SBT_HOR_FLAG = 325
    SBT_POS_FLAG = 328
    CROSS_COMP_PRED = 329
    CHROMA_QP_ADJ_FLAG = 339
    CHROMA_QP_ADJ_IDC = 340
    IMV_FLAG = 341
    CTB_ALF_FLAG = 346
    CTB_ALF_ALTERNATIVE = 355
    ALF_USE_TEMPORAL_FILT = 357
    CC_ALF_FILTER_CONTROL_FLAG = 358
    CIIP_FLAG = 364
    IBC_FLAG = 365
    JOINT_CB_CR_FLAG = 368
    TS_SIG_COEFF_GROUP = 371
    TS_SIG_FLAG = 374
    TS_PAR_FLAG = 377
    TS_GTX_FLAG = 378
    TS_LRG1_FLAG = 383
    TS_RESIDUAL_SIGN = 387


_INIT_BY_SLICE_TYPE = {
    0: INIT_VALUES_B,  # B slice
    1: INIT_VALUES_P,  # P slice
    2: INIT_VALUES_I,  # I slice
}


def init_context_states(slice_type: int, slice_qp: int):
    """Build initial (state0, state1, shift0, shift1) lists for all contexts.

    H.266 9.3.2.2: preCtxState from initValue's slope/offset nibbles and the
    clipped slice QP; pStateIdx0/1 are the 10/14-bit halves of
    (preCtxState << 8); shifts come from the 4-bit rate value.
    """
    init_tab = _INIT_BY_SLICE_TYPE[slice_type]
    qp = max(0, min(63, slice_qp))
    state0 = [0] * NB_CTX
    state1 = [0] * NB_CTX
    shift0 = [0] * NB_CTX
    shift1 = [0] * NB_CTX
    for i in range(NB_CTX):
        init_value = init_tab[i]
        slope = (init_value >> 3) - 4
        offset = ((init_value & 7) * 18) + 1
        pre = ((slope * (qp - 16)) >> 1) + offset
        pre = max(1, min(127, pre))
        p = pre << 8  # 15-bit probability
        state0[i] = p & 0x7FE0  # pStateIdx0 << 5
        state1[i] = p & 0x7FFE  # pStateIdx1 << 1
        rate = RATE_INIT[i]
        sh0 = 2 + ((rate >> 2) & 3)
        shift0[i] = sh0
        shift1[i] = 3 + sh0 + (rate & 3)
    return state0, state1, shift0, shift1
