from openvvc_tpu.hls.nal import (
    NalType,
    NalUnit,
    demux_annexb,
    group_picture_units,
    mux_annexb,
)


def test_nal_roundtrip():
    nalus = [
        NalUnit(NalType.SPS, b"\x12\x34\x00\x00\x01\x55"),
        # RBSP always ends with the rbsp_stop_one_bit => last byte nonzero
        NalUnit(NalType.PPS, b"\x00\x00\x80"),
        NalUnit(NalType.IDR_W_RADL, bytes(range(64)) + b"\x80", temporal_id=0),
        NalUnit(NalType.TRAIL, b"\x80", temporal_id=1),
    ]
    stream = mux_annexb(nalus)
    back = demux_annexb(stream)
    assert len(back) == len(nalus)
    for a, b in zip(nalus, back):
        assert a.type == b.type
        assert a.rbsp == b.rbsp
        assert a.temporal_id == b.temporal_id


def test_picture_unit_grouping():
    nalus = [
        NalUnit(NalType.SPS, b"\x01"),
        NalUnit(NalType.PPS, b"\x02"),
        NalUnit(NalType.IDR_W_RADL, b"\x03"),
        NalUnit(NalType.TRAIL, b"\x04"),
        NalUnit(NalType.PREFIX_SEI, b"\x05"),
        NalUnit(NalType.TRAIL, b"\x06"),
    ]
    pus = group_picture_units(nalus)
    assert len(pus) == 3
    assert [len(p.nalus) for p in pus] == [3, 1, 2]
    assert [len(p.vcl_nalus) for p in pus] == [1, 1, 1]
