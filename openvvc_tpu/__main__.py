"""CLI decode tool: python -m openvvc_tpu -i in.266 -o out.yuv [--md5]

Semantics parity with the reference's example program
(/root/reference/examples/dectest.c:303-428): decodes an Annex-B .266
stream, writes planar YUV in output (display) order with the conformance
window cropped (dectest.c:372-399 — window offsets are chroma-sample units,
doubled for luma in 4:2:0), and with --md5 prints the MD5 of the output YUV
so the reference CI methodology (CI/checkMD5.sh) can be replicated unchanged.
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time


def crop_frame_bytes(frame, pps) -> bytes:
    """Planar YUV for one frame with the conformance window cropped.

    The window is per-frame (PPS window when flagged, else SPS —
    dpb.c:1151-1161); pps is the fallback for frames without one."""
    import numpy as np

    win = getattr(frame, "output_window", None)
    if win is not None:
        lft, rgt, top, bot = win
    else:
        lft = int(getattr(pps, "pps_conf_win_left_offset", 0) or 0)
        rgt = int(getattr(pps, "pps_conf_win_right_offset", 0) or 0)
        top = int(getattr(pps, "pps_conf_win_top_offset", 0) or 0)
        bot = int(getattr(pps, "pps_conf_win_bottom_offset", 0) or 0)
    if not (lft or rgt or top or bot):
        return frame.to_yuv_bytes()

    planes = [frame.y[top * 2: frame.y.shape[0] - bot * 2,
                      lft * 2: frame.y.shape[1] - rgt * 2]]
    if frame.cb is not None:
        planes.append(frame.cb[top: frame.cb.shape[0] - bot,
                               lft: frame.cb.shape[1] - rgt])
        planes.append(frame.cr[top: frame.cr.shape[0] - bot,
                               lft: frame.cr.shape[1] - rgt])
    if frame.bitdepth == 8:
        return b"".join(np.asarray(p).astype(np.uint8).tobytes() for p in planes)
    return b"".join(np.asarray(p).astype("<u2").tobytes() for p in planes)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m openvvc_tpu")
    ap.add_argument("-i", "--infile", required=True)
    ap.add_argument("-o", "--outfile", default=None)
    ap.add_argument("--md5", action="store_true", help="print MD5 of output YUV")
    ap.add_argument("--tpu", action="store_true",
                    help="use the batched device reconstruction path")
    ap.add_argument("--fps", action="store_true", help="print decode fps")
    ap.add_argument("-u", "--upscale", action="store_true",
                    help="RPR: upscale output frames to the SPS max size "
                         "(dectest -u 1)")
    ap.add_argument("-t", "--nb-frame-threads", type=int, default=0,
                    help="frame threads (dectest -t; the frame pipeline "
                         "depth — 0 derives it)")
    ap.add_argument("-e", "--nb-entry-threads", type=int, default=0,
                    help="entry (tile) threads (dectest -e; 0 = #cores)")
    ap.add_argument("--streaming", action="store_true",
                    help="constant-memory decode: 64 KiB chunked demux, "
                         "incremental reorder-gated output "
                         "(ovdec_receive_picture semantics)")
    args = ap.parse_args(argv)

    from openvvc_tpu.decoder import Decoder

    dec = Decoder(use_tpu=args.tpu, upscale=args.upscale,
                  nb_entry_threads=args.nb_entry_threads,
                  nb_frame_threads=args.nb_frame_threads or 4)

    if args.streaming:
        from openvvc_tpu.io import FileIO

        md5 = hashlib.md5()
        outf = (open(args.outfile, "wb")
                if args.outfile and args.outfile != "/dev/null" else None)
        n = 0
        t0 = time.monotonic()
        for frame in dec.decode_stream(FileIO(args.infile)):
            b = crop_frame_bytes(frame, dec.last_pps)
            if outf:
                outf.write(b)
            md5.update(b)
            n += 1
        dt = time.monotonic() - t0
        if outf:
            outf.close()
        if args.md5:
            print(md5.hexdigest())
        if args.fps:
            print(f"{n} frames in {dt:.2f}s = {n / dt:.3f} fps",
                  file=sys.stderr)
        print(f"Decoded {n} pictures", file=sys.stderr)
        return 0

    with open(args.infile, "rb") as f:
        stream = f.read()

    t0 = time.monotonic()
    frames = dec.decode(stream)
    dt = time.monotonic() - t0

    out = b"".join(crop_frame_bytes(f, dec.last_pps)
                   for f in dec.output_order(frames))
    if args.outfile and args.outfile != "/dev/null":
        with open(args.outfile, "wb") as f:
            f.write(out)
    if args.md5:
        print(hashlib.md5(out).hexdigest())
    if args.fps:
        print(f"{len(frames)} frames in {dt:.2f}s = {len(frames) / dt:.3f} fps",
              file=sys.stderr)
    print(f"Decoded {len(frames)} pictures", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
