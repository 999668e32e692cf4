/* GPM (geometric partitioning) geometry shared by parse.c (per-unit MV
 * storage mix) and recon.c (per-sample blend weights + DBF motion).
 *
 * Parity: drv/gpm.py (itself oracle bit-exact vs /root/reference/libovvc/
 * rcn_gpm.c g_GeoParams/g_Dis/weight masks :149, rcn_inter.c
 * rcn_gpm_weights_and_steps :127, drv_mvp.c drv_gpm_merge_mvp_b :1910,
 * update_gpm_mv_ctx :1482). */
#ifndef OV_GPM_INL_H
#define OV_GPM_INL_H

static const int8_t GPM_PARAMS[64][2] = {
    {0, 1}, {0, 3}, {2, 0}, {2, 1}, {2, 2}, {2, 3}, {3, 0}, {3, 1},
    {3, 2}, {3, 3}, {4, 0}, {4, 1}, {4, 2}, {4, 3}, {5, 0}, {5, 1},
    {5, 2}, {5, 3}, {8, 1}, {8, 3}, {11, 0}, {11, 1}, {11, 2}, {11, 3},
    {12, 0}, {12, 1}, {12, 2}, {12, 3}, {13, 0}, {13, 1}, {13, 2}, {13, 3},
    {14, 0}, {14, 1}, {14, 2}, {14, 3}, {16, 1}, {16, 3}, {18, 1}, {18, 2},
    {18, 3}, {19, 1}, {19, 2}, {19, 3}, {20, 1}, {20, 2}, {20, 3}, {21, 1},
    {21, 2}, {21, 3}, {24, 1}, {24, 3}, {27, 1}, {27, 2}, {27, 3}, {28, 1},
    {28, 2}, {28, 3}, {29, 1}, {29, 2}, {29, 3}, {30, 1}, {30, 2}, {30, 3}};

static const int8_t GPM_DIS[32] = {
    8, 8, 8, 8, 4, 4, 2, 1, 0, -1, -2, -4, -4, -8, -8, -8,
    -8, -8, -8, -8, -4, -4, -2, -1, 0, 1, 2, 4, 4, 8, 8, 8};

static const int8_t GPM_A2MIRROR[32] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 2};

static const int8_t GPM_A2MASK[32] = {
    0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1, 4, 3, 2, 1, -1,
    0, -1, 1, 2, 3, 4, -1, -1, 5, -1, -1, 4, 3, 2, 1, -1};

/* mask-class generator angle (the angle_idx whose GPM_A2MASK == class) */
static const int8_t GPM_CLASS2A[6] = {0, 2, 3, 4, 5, 8};

#define GPM_MASK_SZ 112 /* 3*(64>>3)*2 + 64 */

/* per-sample blend weight w0 (applies to partition 0), luma coords
 * (drv/gpm.py gpm_weights evaluated pointwise) */
static inline int gpm_weight_at(int split_dir, int l2w, int l2h, int x,
                                int y)
{
    int angle = GPM_PARAMS[split_dir][0];
    int distance = GPM_PARAMS[split_dir][1];
    int mirror = GPM_A2MIRROR[angle];
    int w = 1 << l2w, h = 1 << l2h;
    int ox = (GPM_MASK_SZ - w) >> 1;
    int oy = (GPM_MASK_SZ - h) >> 1;
    if (distance > 0) {
        if ((angle & 15) == 8 || ((angle & 15) != 0 && h >= w))
            oy += (angle < 16) ? ((distance * h) >> 3)
                               : -((distance * h) >> 3);
        else
            ox += (angle < 16) ? ((distance * w) >> 3)
                               : -((distance * w) >> 3);
    }
    int row, col;
    if (mirror == 2) {
        row = (GPM_MASK_SZ - 1 - oy) - y;
        col = ox + x;
    } else if (mirror == 1) {
        row = oy + y;
        col = (GPM_MASK_SZ - 1 - ox) - x;
    } else {
        row = oy + y;
        col = ox + x;
    }
    int a0 = GPM_CLASS2A[(int)GPM_A2MASK[angle]];
    int dx = a0, dy = (a0 + 8) & 31;
    int rho = ((int)GPM_DIS[dx] << 7) + ((int)GPM_DIS[dy] << 7);
    int offm = (2 * 64 - GPM_MASK_SZ) >> 1;
    int ly = (((row + offm) << 1) + 1) * GPM_DIS[dy];
    int sx = (((col + offm) << 1) + 1) * GPM_DIS[dx];
    int v = (32 + (sx + ly - rho) + 4) >> 3;
    return v < 0 ? 0 : (v > 8 ? 8 : v);
}

/* per-4x4-unit storage mix (update_gpm_mv_ctx): msk 2 = blended region
 * (combined MV info), 0 = partition 0, 1 = partition 1 */
static inline int gpm_unit_msk(int split_dir, int nw, int nh, int x, int y)
{
    int angle = GPM_PARAMS[split_dir][0];
    int d_idx = GPM_PARAMS[split_dir][1];
    int x_dis = GPM_DIS[angle];
    int y_dis = GPM_DIS[(angle + 8) & 31];
    int flip = angle >= 13 && angle <= 27;
    int off_x = (-nw * 4) >> 1;
    int off_y = (-nh * 4) >> 1;
    if (d_idx > 0) {
        if ((angle & 15) == 8 || ((angle & 15) != 0 && nh >= nw))
            off_y += (angle < 16) ? ((d_idx * nh) >> 1)
                                  : -((d_idx * nh) >> 1);
        else
            off_x += (angle < 16) ? ((d_idx * nw) >> 1)
                                  : -((d_idx * nw) >> 1);
    }
    int lookup_y = (((4 * y + off_y) * 2) + 5) * y_dis;
    int midx = (((4 * x + off_x) * 2) + 5) * x_dis + lookup_y;
    int amid = midx < 0 ? -midx : midx;
    if (amid < 32)
        return 2;
    return midx <= 0 ? (1 - flip) : flip;
}

#endif /* OV_GPM_INL_H */
