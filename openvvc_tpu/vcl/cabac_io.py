"""Symmetric CABAC syntax I/O.

Like hls.syntax, every slice-data syntax structure is written once as a
function over a `CabacIO`; with a `CabacReaderIO` it decodes bins into the
node object, with a `CabacWriterIO` it encodes the node's fields. The
round-trip property (generate -> parse -> identical tree) is enforced by unit
tests, replacing the reference's asymmetric read-only parsers
(/root/reference/libovvc/vcl_coding_tree.c, vcl_coding_unit.c, ...).
"""

from __future__ import annotations

from openvvc_tpu.cabac.engine import CabacDecoder, CabacEncoder


class CabacReaderIO:
    is_reader = True

    def __init__(self, dec: CabacDecoder):
        self.dec = dec

    def bin(self, obj, name: str, ctx_idx: int) -> int:
        v = self.dec.decode_bin(ctx_idx)
        setattr(obj, name, v)
        return v

    def bypass(self, obj, name: str) -> int:
        v = self.dec.decode_bypass()
        setattr(obj, name, v)
        return v

    def bypass_bits(self, obj, name: str, n: int) -> int:
        v = self.dec.decode_bypass_bits(n)
        setattr(obj, name, v)
        return v

    # --- raw (value-returning, not stored) ---------------------------
    def raw_bin(self, ctx_idx: int) -> int:
        return self.dec.decode_bin(ctx_idx)

    def raw_bypass(self) -> int:
        return self.dec.decode_bypass()

    def raw_bypass_bits(self, n: int) -> int:
        return self.dec.decode_bypass_bits(n)

    def terminate(self) -> int:
        return self.dec.decode_terminate()

    # --- common binarizations ----------------------------------------
    def truncated_unary_ctx(self, obj, name: str, cmax: int, ctx_of) -> int:
        """TU binarization, each bin ctx-coded; ctx_of(k) gives ctx for bin k."""
        v = 0
        while v < cmax and self.dec.decode_bin(ctx_of(v)):
            v += 1
        setattr(obj, name, v)
        return v

    def truncated_unary_bypass(self, obj, name: str, cmax: int) -> int:
        v = 0
        while v < cmax and self.dec.decode_bypass():
            v += 1
        setattr(obj, name, v)
        return v

    def truncated_binary_bypass(self, obj, name: str, cmax: int) -> int:
        """TB binarization (9.3.3.4) over alphabet size cmax+1."""
        n = cmax + 1
        k = n.bit_length() - 1  # floor(log2(n))
        u = (1 << (k + 1)) - n
        v = self.dec.decode_bypass_bits(k)
        if v >= u:
            v = (v << 1) | self.dec.decode_bypass()
            v -= u
        setattr(obj, name, v)
        return v

    def exp_golomb_bypass(self, obj, name: str, k: int) -> int:
        """k-th order Exp-Golomb, bypass coded (9.3.3.5 EGk)."""
        lz = 0
        while self.dec.decode_bypass():
            lz += 1
            if lz > 31:
                raise ValueError("EGk prefix overflow")
        v = ((1 << lz) - 1) << k
        v += self.dec.decode_bypass_bits(lz + k)
        setattr(obj, name, v)
        return v


class CabacWriterIO:
    is_reader = False

    def __init__(self, enc: CabacEncoder):
        self.enc = enc

    def bin(self, obj, name: str, ctx_idx: int) -> int:
        v = int(getattr(obj, name))
        self.enc.encode_bin(v, ctx_idx)
        return v

    def bypass(self, obj, name: str) -> int:
        v = int(getattr(obj, name))
        self.enc.encode_bypass(v)
        return v

    def bypass_bits(self, obj, name: str, n: int) -> int:
        v = int(getattr(obj, name))
        self.enc.encode_bypass_bits(v, n)
        return v

    def raw_bin(self, ctx_idx: int, value: int | None = None) -> int:
        raise NotImplementedError("writer requires explicit value: use put_bin")

    def put_bin(self, value: int, ctx_idx: int) -> int:
        self.enc.encode_bin(value, ctx_idx)
        return value

    def put_bypass(self, value: int) -> int:
        self.enc.encode_bypass(value)
        return value

    def put_bypass_bits(self, value: int, n: int) -> int:
        self.enc.encode_bypass_bits(value, n)
        return value

    def terminate(self, value: int = 0) -> int:
        self.enc.encode_terminate(value)
        return value

    def truncated_unary_ctx(self, obj, name: str, cmax: int, ctx_of) -> int:
        v = int(getattr(obj, name))
        for k in range(v):
            self.enc.encode_bin(1, ctx_of(k))
        if v < cmax:
            self.enc.encode_bin(0, ctx_of(v))
        return v

    def truncated_unary_bypass(self, obj, name: str, cmax: int) -> int:
        v = int(getattr(obj, name))
        for _ in range(v):
            self.enc.encode_bypass(1)
        if v < cmax:
            self.enc.encode_bypass(0)
        return v

    def truncated_binary_bypass(self, obj, name: str, cmax: int) -> int:
        v = int(getattr(obj, name))
        n = cmax + 1
        k = n.bit_length() - 1
        u = (1 << (k + 1)) - n
        if v < u:
            self.enc.encode_bypass_bits(v, k)
        else:
            self.enc.encode_bypass_bits(v + u, k + 1)
        return v

    def exp_golomb_bypass(self, obj, name: str, k: int) -> int:
        v = int(getattr(obj, name))
        lz = 0
        while v >= ((1 << (lz + 1)) - 1) << k:
            lz += 1
        for _ in range(lz):
            self.enc.encode_bypass(1)
        self.enc.encode_bypass(0)
        rem = v - (((1 << lz) - 1) << k)
        self.enc.encode_bypass_bits(rem, lz + k)
        return v
