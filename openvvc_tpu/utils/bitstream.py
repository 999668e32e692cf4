"""Bit-exact bitstream I/O for VVC (H.266).

MSB-first bit reader/writer over RBSP payloads, plus Annex-B
emulation-prevention-byte (EPB, 0x03) insertion/removal.

Reference behavior studied: /root/reference/libovvc/nvcl_utils.h (bit reader),
/root/reference/libovvc/ovannexb.c (EPB scan). This is a fresh implementation of
the normative processes in ITU-T H.266 sections 7.3/7.4 and B.2.
"""

from __future__ import annotations


class BitReader:
    """MSB-first bit reader over a bytes-like RBSP buffer."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def u(self, n: int) -> int:
        """Read n bits as an unsigned integer (f(n)/u(n) descriptor)."""
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise EOFError(f"bitstream overread: want {n} bits at {p}/{self.nbits}")
        self.pos = p + n
        byte0, bit0 = divmod(p, 8)
        byte1 = (p + n - 1) // 8
        chunk = int.from_bytes(self.data[byte0 : byte1 + 1], "big")
        total_bits = (byte1 + 1 - byte0) * 8
        return (chunk >> (total_bits - bit0 - n)) & ((1 << n) - 1)

    def flag(self) -> int:
        return self.u(1)

    def ue(self) -> int:
        """Exp-Golomb ue(v)."""
        # Count leading zero bits.
        lz = 0
        while self.u(1) == 0:
            lz += 1
            if lz > 32:
                raise ValueError("invalid exp-golomb code (>32 leading zeros)")
        if lz == 0:
            return 0
        return (1 << lz) - 1 + self.u(lz)

    def se(self) -> int:
        """Exp-Golomb se(v): 0,1,-1,2,-2,..."""
        k = self.ue()
        # spec 9.2: value = (-1)^(k+1) * ceil(k/2); odd codes positive.
        return ((k + 1) >> 1) if (k & 1) else -(k >> 1)

    def bytes_read(self) -> int:
        return (self.pos + 7) >> 3

    def bits_left(self) -> int:
        return self.nbits - self.pos

    def byte_aligned(self) -> bool:
        return (self.pos & 7) == 0

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        """True if there is more RBSP data before the rbsp_stop_one_bit."""
        if self.pos >= self.nbits:
            return False
        # Find last set bit in the buffer (the rbsp_stop_one_bit).
        for i in range(len(self.data) - 1, -1, -1):
            b = self.data[i]
            if b:
                # lowest set bit index (from MSB position numbering)
                last_one_bitpos = i * 8 + (7 - ((b & -b).bit_length() - 1))
                return self.pos < last_one_bitpos
        return False


class BitWriter:
    """MSB-first bit writer producing an RBSP payload."""

    __slots__ = ("_buf", "_cur", "_nbits")

    def __init__(self):
        self._buf = bytearray()
        self._cur = 0  # partial byte accumulator (int, MSB-first within byte)
        self._nbits = 0  # bits in accumulator [0,8)

    def u(self, value: int, n: int) -> None:
        if n == 0:
            return
        if value < 0 or value >= (1 << n):
            raise ValueError(f"value {value} does not fit in {n} bits")
        nb = self._nbits + n
        acc = (self._cur << n) | value
        while nb >= 8:
            nb -= 8
            self._buf.append((acc >> nb) & 0xFF)
        self._cur = acc & ((1 << nb) - 1)
        self._nbits = nb

    def flag(self, v) -> None:
        self.u(1 if v else 0, 1)

    def ue(self, value: int) -> None:
        if value < 0:
            raise ValueError("ue(v) requires non-negative value")
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:
        if value <= 0:
            self.ue(-2 * value)
        else:
            self.ue(2 * value - 1)

    def byte_aligned(self) -> bool:
        return self._nbits == 0

    def align_zero(self) -> None:
        if self._nbits:
            self.u(0, 8 - self._nbits)

    def rbsp_trailing_bits(self) -> None:
        """rbsp_stop_one_bit followed by zero alignment bits."""
        self.u(1, 1)
        self.align_zero()

    def bit_position(self) -> int:
        return len(self._buf) * 8 + self._nbits

    def get_bytes(self) -> bytes:
        if self._nbits:
            raise ValueError("bitstream not byte-aligned; call rbsp_trailing_bits()")
        return bytes(self._buf)


def strip_emulation_prevention(ebsp: bytes) -> tuple[bytes, list[int]]:
    """Remove 0x03 emulation prevention bytes from an EBSP payload.

    Returns (rbsp, epb_positions) where epb_positions are byte offsets *in the
    input ebsp* of the removed 0x03 bytes (mirrors the EPB table the reference
    demuxer keeps for entry-point correction, /root/reference/libovvc/ovdmx.c:84-160).
    """
    out = bytearray()
    positions: list[int] = []
    i = 0
    n = len(ebsp)
    while True:
        j = ebsp.find(b"\x00\x00\x03", i)
        if j < 0:
            out += ebsp[i:]
            break
        out += ebsp[i : j + 2]
        positions.append(j + 2)
        i = j + 3
    return bytes(out), positions


def insert_emulation_prevention(rbsp: bytes) -> bytes:
    """Insert 0x03 after any 0x0000 followed by a byte <= 0x03 (spec 7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)
