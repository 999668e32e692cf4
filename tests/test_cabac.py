import random

import pytest

from openvvc_tpu.cabac.ctx import init_context_states
from openvvc_tpu.cabac.data_ctx_init import NB_CTX
from openvvc_tpu.cabac.engine import CabacDecoder, CabacEncoder


def roundtrip(ops, slice_type=2, slice_qp=32):
    """ops: list of ('ctx', bin, ctx_idx) | ('ep', bin) | ('trm', bin).

    Encode all ops, terminate, then decode and compare.
    """
    enc = CabacEncoder(slice_type, slice_qp)
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[1], op[2])
        elif op[0] == "ep":
            enc.encode_bypass(op[1])
        elif op[0] == "trm":
            enc.encode_terminate(op[1])
    enc.encode_terminate(1)
    payload = enc.finish()

    dec = CabacDecoder(payload, slice_type, slice_qp)
    for i, op in enumerate(ops):
        if op[0] == "ctx":
            got = dec.decode_bin(op[2])
        elif op[0] == "ep":
            got = dec.decode_bypass()
        else:
            got = dec.decode_terminate()
        assert got == op[1], f"op {i} {op}: decoded {got}"
    assert dec.decode_terminate() == 1
    assert not dec.overread()
    # final probability states must match encoder's (bit-exact adaptation)
    assert dec.s0 == enc.s0 and dec.s1 == enc.s1
    return payload


def test_bypass_only():
    rng = random.Random(7)
    ops = [("ep", rng.getrandbits(1)) for _ in range(1000)]
    roundtrip(ops)


def test_single_ctx_biased():
    rng = random.Random(8)
    ops = [("ctx", 1 if rng.random() < 0.9 else 0, 0) for _ in range(2000)]
    roundtrip(ops)


def test_mixed_random():
    for seed in range(5):
        rng = random.Random(seed)
        ops = []
        for _ in range(3000):
            r = rng.random()
            if r < 0.5:
                ops.append(("ctx", rng.getrandbits(1), rng.randrange(NB_CTX)))
            elif r < 0.9:
                ops.append(("ep", rng.getrandbits(1)))
            else:
                ops.append(("trm", 0))
        roundtrip(ops, slice_type=rng.choice([0, 1, 2]), slice_qp=rng.randrange(64))


def test_empty_payload():
    roundtrip([])


def test_extreme_probabilities():
    # long MPS runs drive states to saturation; then LPS surprises
    ops = [("ctx", 0, 5)] * 5000 + [("ctx", 1, 5)] * 3 + [("ctx", 0, 5)] * 100
    roundtrip(ops)


def test_init_states_qp_dependence():
    a = init_context_states(2, 22)
    b = init_context_states(2, 37)
    assert a[0] != b[0]  # states depend on QP
    assert a[2] == b[2]  # shifts do not


def test_bypass_bits_value():
    enc = CabacEncoder(2, 30)
    enc.encode_bypass_bits(0b1011001110, 10)
    enc.encode_terminate(1)
    payload = enc.finish()
    dec = CabacDecoder(payload, 2, 30)
    assert dec.decode_bypass_bits(10) == 0b1011001110
    assert dec.decode_terminate() == 1
