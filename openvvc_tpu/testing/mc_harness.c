/* Validation harness: drives the reference MC kernels on random data and
 * dumps outputs for comparison with openvvc_tpu.rcn.ref_mc. */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#ifndef BITDEPTH
#define BITDEPTH 10
#endif
#include "rcn_mc.c"

#define W 16
#define H 8
#define PW 64
#define PH 48

static OVSample plane[PH][PW];
static uint32_t s = 12345;
static uint32_t rnd(void){ s = s*1103515245u + 12345u; return s >> 16; }

int main(void){
    int x, y, fx, fy;
    for (y = 0; y < PH; y++) for (x = 0; x < PW; x++)
        plane[y][x] = rnd() & ((1 << BITDEPTH) - 1);
    /* dump plane for python side */
    for (y = 0; y < PH; y++) for (x = 0; x < PW; x++) printf("%d ", plane[y][x]);
    printf("\n");
    int ox = 16, oy = 16; /* origin with full support inside */
    /* 14-bit qpel h/v/hv + pel for all fracs */
    static int16_t dst[MAX_PB_SIZE*MAX_PB_SIZE];
    for (fy = 0; fy < 16; fy++) for (fx = 0; fx < 16; fx++){
        const OVSample* src = &plane[oy][ox];
        if (!fx && !fy) put_vvc_pel_pixels(dst, src, PW, H, fx, fy, W);
        else if (!fy)   put_vvc_qpel_h(dst, src, PW, H, fx, fy, W);
        else if (!fx)   put_vvc_qpel_v(dst, src, PW, H, fx, fy, W);
        else            put_vvc_qpel_hv(dst, src, PW, H, fx, fy, W);
        for (y = 0; y < H; y++) for (x = 0; x < W; x++) printf("%d ", dst[y*MAX_PB_SIZE+x]);
        printf("\n");
    }
    /* uni luma */
    static OVSample udst[MAX_PB_SIZE*MAX_PB_SIZE];
    for (fy = 0; fy < 16; fy++) for (fx = 0; fx < 16; fx++){
        const OVSample* src = &plane[oy][ox];
        if (!fx && !fy) put_vvc_pel_uni_pixels(udst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        else if (!fy)   put_vvc_qpel_uni_h(udst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        else if (!fx)   put_vvc_qpel_uni_v(udst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        else            put_vvc_qpel_uni_hv(udst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        for (y = 0; y < H; y++) for (x = 0; x < W; x++) printf("%d ", udst[y*MAX_PB_SIZE+x]);
        printf("\n");
    }
    /* 4x4 qpel (affine filter select) */
    for (fy = 0; fy < 16; fy++) for (fx = 0; fx < 16; fx++){
        const OVSample* src = &plane[oy][ox];
        if (!fx && !fy) put_vvc_pel_pixels(dst, src, PW, 4, fx, fy, 4);
        else if (!fy)   put_vvc_qpel_h(dst, src, PW, 4, fx, fy, 4);
        else if (!fx)   put_vvc_qpel_v(dst, src, PW, 4, fx, fy, 4);
        else            put_vvc_qpel_hv(dst, src, PW, 4, fx, fy, 4);
        for (y = 0; y < 4; y++) for (x = 0; x < 4; x++) printf("%d ", dst[y*MAX_PB_SIZE+x]);
        printf("\n");
    }
    /* epel chroma 14-bit for all 32 fracs */
    for (fy = 0; fy < 32; fy += 3) for (fx = 0; fx < 32; fx += 3){
        const OVSample* src = &plane[oy][ox];
        if (!fx && !fy) put_vvc_pel_pixels(dst, src, PW, H, fx, fy, W);
        else if (!fy)   put_vvc_epel_h(dst, src, PW, H, fx, fy, W);
        else if (!fx)   put_vvc_epel_v(dst, src, PW, H, fx, fy, W);
        else            put_vvc_epel_hv(dst, src, PW, H, fx, fy, W);
        for (y = 0; y < H; y++) for (x = 0; x < W; x++) printf("%d ", dst[y*MAX_PB_SIZE+x]);
        printf("\n");
    }
    /* bi combine: p0 from (fx=5,fy=9), p1 from (fx=0,fy=0) */
    {
        static int16_t d0[MAX_PB_SIZE*MAX_PB_SIZE];
        const OVSample* src = &plane[oy][ox];
        put_vvc_qpel_hv(d0, src, PW, H, 5, 9, W);
        put_vvc_qpel_bi_h(udst, MAX_PB_SIZE, &plane[oy+1][ox+2], PW, d0, H, 7, 0, W);
        for (y = 0; y < H; y++) for (x = 0; x < W; x++) printf("%d ", udst[y*MAX_PB_SIZE+x]);
        printf("\n");
        /* weighted bi */
        put_weighted_qpel_bi_h((uint8_t*)udst, MAX_PB_SIZE*2, (uint8_t*)&plane[oy+1][ox+2], PW*2, d0, MAX_PB_SIZE, H, 3, 5, 3, 7, 0, W);
        for (y = 0; y < H; y++) for (x = 0; x < W; x++) printf("%d ", udst[y*MAX_PB_SIZE+x]);
        printf("\n");
    }
    /* dmvr bilinear */
    for (fy = 0; fy < 16; fy += 5) for (fx = 0; fx < 16; fx += 5){
        static uint16_t bdst[MAX_PB_SIZE*MAX_PB_SIZE];
        const OVSample* src = &plane[oy][ox];
        if (!fx && !fy) put_vvc_pel_bilinear_pixels(bdst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        else if (!fy)   put_vvc_qpel_bilinear_h(bdst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        else if (!fx)   put_vvc_qpel_bilinear_v(bdst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        else            put_vvc_qpel_bilinear_hv(bdst, MAX_PB_SIZE, src, PW, H, fx, fy, W);
        for (y = 0; y < H; y++) for (x = 0; x < W; x++) printf("%d ", (int16_t)bdst[y*MAX_PB_SIZE+x]);
        printf("\n");
    }
    return 0;
}
