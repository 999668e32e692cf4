"""Symmetric syntax codec framework for VVC high-level syntax.

Each parameter-set syntax structure is described ONCE as a function
``foo_syntax(io, obj, ...)`` operating on a :class:`SyntaxIO`. With a
:class:`SyntaxReader` the function parses a bitstream into ``obj``; with a
:class:`SyntaxWriter` it serializes ``obj``'s fields. This guarantees the
parser and the test-stream generator can never drift apart.

The reference implements read-only parsers per NAL type
(/root/reference/libovvc/nvcl_nal_*.c); we add the write direction because the
build has no access to conformance bitstreams and must generate its own test
corpus (validated against the reference decoder binary as an oracle).
"""

from __future__ import annotations

from openvvc_tpu.utils.bitstream import BitReader, BitWriter


def ceil_log2(x: int) -> int:
    return max(0, (x - 1).bit_length())


class _ZeroField(int):
    """The default value of an unset syntax field: behaves as int 0, but also
    supports `x[i]` (-> 0) so indexed elements can be referenced uniformly
    whether or not the list was ever populated."""

    def __getitem__(self, _idx):
        return _ZERO

    def __repr__(self):
        return "0"


_ZERO = _ZeroField()


class SyntaxStruct:
    """Base for parameter-set objects: unset fields read as 0.

    This mirrors the spec convention that absent syntax elements are inferred
    (almost always to 0); conditional branches then behave identically during
    read and write. Unset fields also support indexing (yielding 0).
    """

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return _ZERO

    def fields(self) -> dict:
        return {k: v for k, v in self.__dict__.items() if not k.startswith("_")}

    def _list_nested(self, name: str, i) -> "ListField":
        """Get/create the nested ListField `self.<name>[i]`."""
        lf = self.__dict__.get(name)
        if lf is None:
            lf = ListField()
            setattr(self, name, lf)
        return lf.nested(i)

    def __repr__(self):
        kv = ", ".join(f"{k}={v}" for k, v in sorted(self.fields().items()))
        return f"{type(self).__name__}({kv})"


class ListField(dict):
    """Sparse int-indexed container for `field[i]` syntax elements; missing -> 0.

    Supports nested indexing: `lf[i][j]` auto-creates a child ListField.
    """

    def __missing__(self, key):
        return 0

    def nested(self, key) -> "ListField":
        v = dict.get(self, key)
        if not isinstance(v, ListField):
            v = ListField()
            self[key] = v
        return v


class SyntaxReader:
    """Reads syntax elements from a BitReader, storing them on the object."""

    is_reader = True

    def __init__(self, br: BitReader):
        self.br = br

    def u(self, obj, name: str, n: int) -> int:
        v = self.br.u(n)
        setattr(obj, name, v)
        return v

    def ue(self, obj, name: str) -> int:
        v = self.br.ue()
        setattr(obj, name, v)
        return v

    def se(self, obj, name: str) -> int:
        v = self.br.se()
        setattr(obj, name, v)
        return v

    def flag(self, obj, name: str) -> int:
        return self.u(obj, name, 1)

    # indexed variants -------------------------------------------------
    def _list(self, obj, name: str) -> ListField:
        lf = obj.__dict__.get(name)
        if lf is None:
            lf = ListField()
            setattr(obj, name, lf)
        return lf

    def u_i(self, obj, name: str, idx, n: int) -> int:
        v = self.br.u(n)
        self._list(obj, name)[idx] = v
        return v

    def ue_i(self, obj, name: str, idx) -> int:
        v = self.br.ue()
        self._list(obj, name)[idx] = v
        return v

    def se_i(self, obj, name: str, idx) -> int:
        v = self.br.se()
        self._list(obj, name)[idx] = v
        return v

    def flag_i(self, obj, name: str, idx) -> int:
        return self.u_i(obj, name, idx, 1)

    def align(self) -> None:
        self.br.align()

    def byte_aligned(self) -> bool:
        return self.br.byte_aligned()

    def more_rbsp_data(self) -> bool:
        return self.br.more_rbsp_data()


class SyntaxWriter:
    """Writes syntax elements from the object's fields to a BitWriter."""

    is_reader = False

    def __init__(self, bw: BitWriter | None = None):
        self.bw = bw if bw is not None else BitWriter()

    def u(self, obj, name: str, n: int) -> int:
        v = int(getattr(obj, name))
        self.bw.u(v, n)
        return v

    def ue(self, obj, name: str) -> int:
        v = int(getattr(obj, name))
        self.bw.ue(v)
        return v

    def se(self, obj, name: str) -> int:
        v = int(getattr(obj, name))
        self.bw.se(v)
        return v

    def flag(self, obj, name: str) -> int:
        return self.u(obj, name, 1)

    def _get_i(self, obj, name: str, idx):
        lst = getattr(obj, name)
        if lst == 0:
            return 0
        return int(lst[idx])

    def u_i(self, obj, name: str, idx, n: int) -> int:
        v = self._get_i(obj, name, idx)
        self.bw.u(v, n)
        return v

    def ue_i(self, obj, name: str, idx) -> int:
        v = self._get_i(obj, name, idx)
        self.bw.ue(v)
        return v

    def se_i(self, obj, name: str, idx) -> int:
        v = self._get_i(obj, name, idx)
        self.bw.se(v)
        return v

    def flag_i(self, obj, name: str, idx) -> int:
        return self.u_i(obj, name, idx, 1)

    def align(self) -> None:
        self.bw.align_zero()

    def byte_aligned(self) -> bool:
        return self.bw.byte_aligned()

    def more_rbsp_data(self) -> bool:
        return False
