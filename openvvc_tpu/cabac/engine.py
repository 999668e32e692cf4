"""VVC CABAC arithmetic decoder and encoder.

Decoder implements ITU-T H.266 section 9.3.4.3 exactly (dual-rate probability
states, 9-bit range, bit-serial renormalization with zero-padding past the
entry end, overread detection). The encoder is the matching arithmetic coder
(low/range with carry buffering, VTM BinEncoder style) used by the test-stream
generator; encoder and decoder are exact inverses, which the unit tests
enforce including final context-state equality.

Behavior parity with the reference engine
(/root/reference/libovvc/cabac_internal.h:45-157, vcl_cabac.c:941-1006) is
expressed through the spec formulation rather than its packed-u64 fixed point.
"""

from __future__ import annotations

from openvvc_tpu.cabac.ctx import init_context_states

__all__ = ["CabacDecoder", "CabacEncoder"]


class CabacDecoder:
    """Arithmetic decoder over one CABAC entry (tile) buffer."""

    __slots__ = (
        "data",
        "bitpos",
        "nbits",
        "range",
        "offset",
        "s0",
        "s1",
        "r0",
        "r1",
    )

    def __init__(self, data: bytes, slice_type: int, slice_qp: int):
        self.data = data
        self.bitpos = 0
        self.nbits = len(data) * 8
        self.s0, self.s1, self.r0, self.r1 = init_context_states(slice_type, slice_qp)
        # 9.3.4.3.1 initialization
        self.range = 510
        self.offset = self._read_bits(9)

    # -- raw bit feed ---------------------------------------------------
    def _read_bit(self) -> int:
        p = self.bitpos
        self.bitpos = p + 1
        if p >= self.nbits:
            return 0  # zero-padding past entry end (overread detectable)
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def _read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self._read_bit()
        return v

    def overread(self) -> bool:
        """True if decode consumed bits past the end of the entry buffer."""
        return self.bitpos > self.nbits

    # -- bin decoding ---------------------------------------------------
    def decode_bin(self, ctx_idx: int) -> int:
        """Context-coded bin, H.266 9.3.4.3.2."""
        s0 = self.s0[ctx_idx]
        s1 = self.s1[ctx_idx]
        p_state = (s0 + s1) >> 1  # 15-bit probability of '1'
        val_mps = p_state >> 14
        q_range = self.range >> 5
        lps_prob = (32767 - p_state if val_mps else p_state) >> 9
        ivl_lps = ((q_range * lps_prob) >> 1) + 4
        self.range -= ivl_lps
        if self.offset >= self.range:
            bin_val = 1 - val_mps
            self.offset -= self.range
            self.range = ivl_lps
        else:
            bin_val = val_mps
        # state update (9.3.4.3.2.2)
        s0 -= (s0 >> self.r0[ctx_idx]) & 0x7FE0
        s1 -= (s1 >> self.r1[ctx_idx]) & 0x7FFE
        if bin_val:
            s0 += (0x7FFF >> self.r0[ctx_idx]) & 0x7FE0
            s1 += (0x7FFF >> self.r1[ctx_idx]) & 0x7FFE
        self.s0[ctx_idx] = s0
        self.s1[ctx_idx] = s1
        # renormalization (9.3.4.3.3)
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bit()
        return bin_val

    def decode_bypass(self) -> int:
        """Bypass bin, H.266 9.3.4.3.4."""
        self.offset = (self.offset << 1) | self._read_bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bypass_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        """end_of_* terminate bin, H.266 9.3.4.3.5."""
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bit()
        return 0

class CabacEncoder:
    """Arithmetic encoder producing a byte-aligned CABAC entry payload."""

    __slots__ = (
        "out",
        "low",
        "range",
        "buffered_byte",
        "num_buffered",
        "bits_left",
        "s0",
        "s1",
        "r0",
        "r1",
    )

    def __init__(self, slice_type: int, slice_qp: int):
        self.out = bytearray()
        self.low = 0
        self.range = 510
        self.buffered_byte = 0xFF
        self.num_buffered = 0
        self.bits_left = 23
        self.s0, self.s1, self.r0, self.r1 = init_context_states(slice_type, slice_qp)

    # -- output machinery ----------------------------------------------
    def _write_out(self) -> None:
        lead = self.low >> (24 - self.bits_left)
        self.bits_left += 8
        self.low &= 0xFFFFFFFF >> self.bits_left
        if lead == 0xFF:
            self.num_buffered += 1
        elif self.num_buffered > 0:
            carry = lead >> 8
            self.out.append((self.buffered_byte + carry) & 0xFF)
            fill = (0xFF + carry) & 0xFF
            for _ in range(self.num_buffered - 1):
                self.out.append(fill)
            self.buffered_byte = lead & 0xFF
            self.num_buffered = 1
        else:
            self.num_buffered = 1
            self.buffered_byte = lead & 0xFF

    def _test_write(self) -> None:
        if self.bits_left < 12:
            self._write_out()

    # -- bin encoding ---------------------------------------------------
    def encode_bin(self, bin_val: int, ctx_idx: int) -> None:
        s0 = self.s0[ctx_idx]
        s1 = self.s1[ctx_idx]
        p_state = (s0 + s1) >> 1
        val_mps = p_state >> 14
        q_range = self.range >> 5
        lps_prob = (32767 - p_state if val_mps else p_state) >> 9
        ivl_lps = ((q_range * lps_prob) >> 1) + 4
        self.range -= ivl_lps
        if bin_val != val_mps:
            num_bits = _RENORM_BITS[ivl_lps >> 3]
            self.low = (self.low + self.range) << num_bits
            self.range = ivl_lps << num_bits
            self.bits_left -= num_bits
            self._test_write()
        elif self.range < 256:
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
            self._test_write()
        s0 -= (s0 >> self.r0[ctx_idx]) & 0x7FE0
        s1 -= (s1 >> self.r1[ctx_idx]) & 0x7FFE
        if bin_val:
            s0 += (0x7FFF >> self.r0[ctx_idx]) & 0x7FE0
            s1 += (0x7FFF >> self.r1[ctx_idx]) & 0x7FFE
        self.s0[ctx_idx] = s0
        self.s1[ctx_idx] = s1

    def encode_bypass(self, bin_val: int) -> None:
        self.low <<= 1
        if bin_val:
            self.low += self.range
        self.bits_left -= 1
        self._test_write()

    def encode_bypass_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.encode_bypass((value >> i) & 1)

    def encode_terminate(self, bin_val: int) -> None:
        self.range -= 2
        if bin_val:
            self.low += self.range
            self.low <<= 7
            self.range = 2 << 7
            self.bits_left -= 7
        elif self.range >= 256:
            return
        else:
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
        self._test_write()

    def finish(self) -> bytes:
        """Flush (after a terminate-1 bin) and return the byte-aligned payload.

        Appends the rbsp-stop bit pattern of the CABAC flush: the final payload
        ends with the '1' alignment bit then zeros, as slice entries must be
        byte-aligned (spec 9.3.4.3.5 decoder flush reads 7 bits).
        """
        if (self.low >> (32 - self.bits_left)) & 0xFF:
            self.out.append((self.buffered_byte + 1) & 0xFF)
            for _ in range(self.num_buffered - 1):
                self.out.append(0x00)
            self.low -= 1 << (32 - self.bits_left)
        else:
            if self.num_buffered > 0:
                self.out.append(self.buffered_byte)
            for _ in range(self.num_buffered - 1):
                self.out.append(0xFF)
        # write remaining low bits: 24 - bits_left bits from low >> 8
        nbits = 24 - self.bits_left
        val = (self.low >> 8) & ((1 << nbits) - 1) if nbits else 0
        acc_bits = nbits
        # append '1' stop bit + zero padding to byte boundary
        val = (val << 1) | 1
        acc_bits += 1
        pad = (8 - (acc_bits & 7)) & 7
        val <<= pad
        acc_bits += pad
        for shift in range(acc_bits - 8, -1, -8):
            self.out.append((val >> shift) & 0xFF)
        return bytes(self.out)


# Renormalization shift per LPS range (range>>3 in [0,63] -> shift to reach
# [256,512)); identical to the spec's RenormTable_32 expansion.
_RENORM_BITS = [6] + [5] * 1 + [4] * 2 + [3] * 4 + [2] * 8 + [1] * 16 + [0] * 32
