# Builds the reference decoder WITH its x86 SIMD backends enabled — this is
# the performance baseline binary (the oracle build uses -DNO_SIMD for
# bit-exact scalar behavior checks; this build matches how OpenVVC actually
# ships on x86: SSE4.1 + AVX2 kernels on the 16-bit sample path).
# No code is copied into this repo; the binary lives in /tmp.
set -e
mkdir -p /tmp/refperf
cat > /tmp/refperf/ovconfig.h <<EOH
#ifndef OVCONFIG_H
#define OVCONFIG_H
#define HAVE_PTHREAD 1
#define USE_THREADS 1
#define ENABLE_SLHDR 0
#define HAVE_X86_OPTIM 1
#define HAVE_SSE4_1 1
#define HAVE_AVX2 1
#endif
EOH
cp /tmp/refbuild/ovversion.h /tmp/refperf/ 2>/dev/null || cat > /tmp/refperf/ovversion.h <<EOH
#ifndef OVVERSION_H
#define OVVERSION_H
#define VER_MAJOR 1
#define VER_MINOR 1
#define VER_REVISION 0
#define VER_BUILD "perf"
#define OV_VERSION "1.1.0"
#define OV_STR(s) #s
#define OV_VERSION_STR(maj,min,rev,build) OV_STR(maj)OV_STR(.)OV_STR(min)OV_STR(.)OV_STR(rev)OV_STR(-)build
#endif
EOH
cd /tmp/refperf
SRC=/root/reference/libovvc
CFLAGS="-O3 -std=gnu99 -I/tmp/refperf -I$SRC -w -pthread"
DSP="rcn_alf rcn_ctu rcn_df rcn_intra rcn_inter rcn_intra_cclm rcn_prof_bdof rcn_transform rcn_transform_scale rcn_transform_tree rcn_fill_ref rcn_intra_angular rcn_intra_dc_planar rcn_ibc rcn_lmcs rcn_residuals rcn_dequant rcn_intra_mip rcn_mc rcn_sao"
MAIN="ctudec data_rcn_angular data_rcn_mip data_rcn_transform data_scan_lut dec_init dpb dpb_internal mempool mvpool nvcl nvcl_dpb nvcl_nal_ph nvcl_nal_aps nvcl_nal_pps nvcl_nal_sps nvcl_nal_sei nvcl_ptl nvcl_rpl ovdec ovutils ovmem overror ovdmx ovio ovlog ovannexb ovunits ovframe ovframepool pp_film_grain post_proc pp_pic_scale ovthreads drv_affine_mvp drv_lines drv_lfnst drv_intra drv_mvp drv_ibc rcn rcn_lfnst rcn_gpm compat_old slicedec vcl_alf vcl_sao vcl_sh vcl_coding_unit vcl_coding_tree vcl_transform_unit vcl_residual_coding vcl_cabac"
SSE=$(ls $SRC/x86/*_sse.c | sed 's|.*/||;s|\.c$||')
AVX=$(ls $SRC/x86/*_avx2.c | sed 's|.*/||;s|\.c$||')
rm -rf obj; mkdir -p obj
for f in $DSP; do
  gcc $CFLAGS -DBITDEPTH=8  -c $SRC/$f.c -o obj/${f}_8.o &
  gcc $CFLAGS -DBITDEPTH=10 -c $SRC/$f.c -o obj/${f}_10.o &
  wait
done
for f in $SSE; do
  gcc $CFLAGS -msse4.2 -DBITDEPTH=10 -c $SRC/x86/$f.c -o obj/x86_${f}.o &
done
for f in $AVX; do
  gcc $CFLAGS -mavx2 -DBITDEPTH=10 -c $SRC/x86/$f.c -o obj/x86_${f}.o &
done
wait
for b in $MAIN; do
  gcc $CFLAGS -c $SRC/$b.c -o obj/${b}.o &
done
wait
gcc $CFLAGS -c /root/reference/examples/dectest.c -o obj/dectest.o
gcc obj/*.o -o dectest -pthread -lm
echo "built /tmp/refperf/dectest"
