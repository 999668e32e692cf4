"""Streaming IO: the OVIO abstraction + chunked Annex-B demux.

Parity targets: the reference's stdio-like vtable `OVIO`
(/root/reference/libovvc/ovio.h:48-54, ovio.c) and the 64 KiB chunked
demuxer `ovdmx_extract_picture_unit` (/root/reference/libovvc/ovdmx.c:568,
extract_nal_unit :414): start-code scan across chunk boundaries, NAL
extraction, and picture-unit grouping — without ever holding the whole
bitstream in memory."""

from __future__ import annotations

from openvvc_tpu.hls.nal import NalType, NalUnit, PictureUnit, is_vcl

CHUNK = 64 * 1024  # reference ovdmx.c chunk size


class OVIO:
    """stdio-like vtable (ovio.h:48-54): read/eof/close/size."""

    def read(self, n: int) -> bytes:
        raise NotImplementedError

    def eof(self) -> bool:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def size(self) -> int | None:
        return None


class FileIO(OVIO):
    """Default file-backed IO (ovio.c OVFileIO)."""

    def __init__(self, path):
        self._f = open(path, "rb")
        self._eof = False

    def read(self, n: int) -> bytes:
        b = self._f.read(n)
        if len(b) < n:
            self._eof = True
        return b

    def eof(self) -> bool:
        return self._eof

    def close(self) -> None:
        self._f.close()

    def size(self) -> int | None:
        import os

        return os.fstat(self._f.fileno()).st_size


class MemIO(OVIO):
    """Bytes-backed IO for in-memory streams."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0

    def read(self, n: int) -> bytes:
        b = self._d[self._pos:self._pos + n]
        self._pos += len(b)
        return b

    def eof(self) -> bool:
        return self._pos >= len(self._d)

    def size(self) -> int | None:
        return len(self._d)


def demux_nals(io_obj: OVIO, chunk: int = CHUNK):
    """Incremental Annex-B demux: yields NalUnit as soon as each is
    complete, reading `chunk` bytes at a time (ovdmx.c extract_nal_unit).

    Keeps only the bytes of the NAL currently being assembled plus up to
    2 carry bytes for start codes straddling a chunk boundary."""
    buf = b""
    started = False  # saw the first start code
    while True:
        data = io_obj.read(chunk)
        final = io_obj.eof() or not data
        buf += data
        # scan for start codes; emit complete NALs
        pos = 0
        while True:
            idx = buf.find(b"\x00\x00\x01", pos)
            if idx < 0:
                break
            if started:
                payload = buf[:idx]
                # trim trailing zeros (start-code prefix / padding),
                # split_annexb parity
                while payload and payload[-1] == 0:
                    payload = payload[:-1]
                if payload:
                    yield NalUnit.parse(payload)
            started = True
            buf = buf[idx + 3:]
            pos = 0
        if final:
            payload = buf
            while payload and payload[-1] == 0:
                payload = payload[:-1]
            if started and payload:
                yield NalUnit.parse(payload)
            return
        # keep at most the (possibly partial) current NAL + carry; nothing
        # to trim — buf already holds only post-start-code bytes


def demux_picture_units(io_obj: OVIO, chunk: int = CHUNK):
    """Incremental picture-unit grouping (ovdmx_extract_picture_unit):
    yields PictureUnit objects one at a time."""
    suffix_types = {NalType.SUFFIX_SEI, NalType.SUFFIX_APS, NalType.EOS,
                    NalType.EOB, NalType.FD}
    cur = PictureUnit()
    seen_vcl = False
    for nal in demux_nals(io_obj, chunk):
        if seen_vcl and nal.type not in suffix_types:
            yield cur
            cur = PictureUnit()
            seen_vcl = False
        cur.nalus.append(nal)
        if is_vcl(nal.type):
            seen_vcl = True
    if cur.nalus:
        yield cur
