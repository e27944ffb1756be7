"""Unit tests for the vendored pure-Python protobuf shim
(vendor/protobuf_shim) that activates the A22 ``transformWithStateInPandas``
tier when the real ``google.protobuf`` distribution is absent.

The shim is validated two ways:
- wire-format invariants checked against hand-computed byte strings from
  the PUBLIC encoding spec (https://protobuf.dev/programming-guides/encoding/);
- executing PySpark's real generated ``StateMessage_pb2`` module and
  round-tripping the exact message shapes the TWS state-server clients build.

End-to-end coverage (JVM state server parsing our bytes) lives in
test_streaming_dual.py::test_q38b_tws_matches_batch.
"""

from __future__ import annotations

import pytest

from fs2_kafka_streams_spark.vendor import ensure_protobuf

MODE = ensure_protobuf()

pytestmark = pytest.mark.skipif(
    MODE == "none", reason="no protobuf implementation available"
)


def _rt():
    from google.protobuf import _shim_runtime as rt

    return rt


# ---------------------------------------------------------------------------
# wire-format primitives (shim only — the real lib doesn't expose these)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(MODE != "shim", reason="shim internals")
def test_varint_spec_vectors():
    rt = _rt()
    # spec examples: 1 -> 01, 150 -> 9601, 300 -> ac02
    assert rt.encode_varint(1) == b"\x01"
    assert rt.encode_varint(150) == b"\x96\x01"
    assert rt.encode_varint(300) == b"\xac\x02"
    # negative int64 encodes as 10-byte two's-complement varint
    assert len(rt.encode_varint(-1)) == 10
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -7, -(2**63)):
        enc = rt.encode_varint(v)
        dec, pos = rt.decode_varint(enc, 0)
        assert pos == len(enc)
        assert rt._to_signed64(dec) == v


@pytest.mark.skipif(MODE != "shim", reason="shim internals")
def test_iter_wire_skips_unknown_and_handles_fixed():
    rt = _rt()
    import struct

    buf = (
        b"\x08\x2a"  # field 1, varint 42
        + b"\x15" + struct.pack("<I", 7)  # field 2, fixed32
        + b"\x19" + struct.pack("<Q", 9)  # field 3, fixed64
        + b"\x22\x03abc"  # field 4, bytes
    )
    got = list(rt.iter_wire(buf))
    assert got == [(1, 0, 42), (2, 5, 7), (3, 1, 9), (4, 2, b"abc")]


# ---------------------------------------------------------------------------
# the generated StateMessage_pb2 module under the shim (or real lib)
# ---------------------------------------------------------------------------


def _sm():
    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

    return sm


def test_handle_state_request_exact_bytes():
    """SetHandleState(INITIALIZED) inside StateRequest: bytes computable by
    hand from the spec — field 2 LEN{ field 1 LEN{ field 1 VARINT 2 } }."""
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == b"\x12\x04\n\x02\x08\x02"


def test_module_level_enum_constants():
    sm = _sm()
    assert sm.PRE_INIT == 0
    assert sm.CREATED == 1
    assert sm.INITIALIZED == 2
    assert sm.DATA_PROCESSED == 3
    assert sm.TIMER_PROCESSED == 4
    assert sm.CLOSED == 5


def test_nested_autovivified_presence():
    """The clients' ``cmd.ttl.durationMs = x`` pattern must mark ``ttl``
    present; an untouched read must NOT serialize the field."""
    sm = _sm()
    untouched = sm.StateCallCommand(stateName="s")
    _ = untouched.ttl  # read-only access
    assert b"durationMs" not in untouched.SerializeToString()
    ser_before = untouched.SerializeToString()

    cmd = sm.StateCallCommand(stateName="s")
    cmd.ttl.durationMs = 5000
    ser_after = cmd.SerializeToString()
    assert ser_after != ser_before
    back = sm.StateCallCommand()
    back.ParseFromString(ser_after)
    assert back.ttl.durationMs == 5000
    assert back.stateName == "s"


def test_empty_message_oneof_is_serialized():
    """Exists()/Get()/Clear() are zero-field messages set as oneof arms —
    they MUST appear on the wire as zero-length LEN fields (that's how the
    server learns which method was called)."""
    sm = _sm()
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    data = call.SerializeToString()
    # field 1 "s", field 2 zero-length
    assert data == b"\n\x01s\x12\x00"


def test_value_state_update_roundtrip():
    sm = _sm()
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="latest",
                valueStateUpdate=sm.ValueStateUpdate(value=b"\x00\x01\xff"),
            )
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    vsc = back.stateVariableRequest.valueStateCall
    assert vsc.stateName == "latest"
    assert vsc.valueStateUpdate.value == b"\x00\x01\xff"


def test_response_parsing_defaults_and_repeated():
    sm = _sm()
    # absent fields read as proto3 defaults
    resp = sm.StateResponse()
    resp.ParseFromString(b"")
    assert resp.statusCode == 0
    assert resp.errorMessage == ""
    assert resp.value == b""

    src = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb"], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(src.SerializeToString())
    assert list(back.value) == [b"a", b"bb"]
    assert back.requireNextFetch is True

    t = sm.TimerInfo()
    t.timestampMs = -5  # negative int64 must round-trip
    src2 = sm.StateResponseWithTimer(timer=[t, sm.TimerInfo(timestampMs=9)])
    back2 = sm.StateResponseWithTimer()
    back2.ParseFromString(src2.SerializeToString())
    assert [x.timestampMs for x in back2.timer] == [-5, 9]


def test_unknown_fields_are_skipped():
    sm = _sm()
    resp = sm.StateResponse()
    # field 99 varint + a real statusCode=7
    resp.ParseFromString(b"\xb8\x06\x01\x08\x07")
    assert resp.statusCode == 7


def test_long_and_string_typed_responses():
    sm = _sm()
    lv = sm.StateResponseWithLongTypeVal(statusCode=0, value=2**40)
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(lv.SerializeToString())
    assert back.value == 2**40

    sv = sm.StateResponseWithStringTypeVal(value="schéma ✓")
    back2 = sm.StateResponseWithStringTypeVal()
    back2.ParseFromString(sv.SerializeToString())
    assert back2.value == "schéma ✓"


def test_map_state_call_shapes():
    sm = _sm()
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            mapStateCall=sm.MapStateCall(
                stateName="m",
                updateValue=sm.UpdateValue(userKey=b"k", value=b"v"),
            )
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    msc = back.stateVariableRequest.mapStateCall
    assert (msc.updateValue.userKey, msc.updateValue.value) == (b"k", b"v")

    pair = sm.KeyAndValuePair(key=b"k1", value=b"v1")
    it = sm.StateResponseWithMapIterator(kvPair=[pair], requireNextFetch=False)
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [(b"k1", b"v1")]


def test_nested_repeated_append_marks_presence():
    """Appending to a repeated field of an auto-vivified submessage must
    serialize the whole chain — a plain-list container would leave the
    parent unmarked and silently drop the submessage from the wire."""
    sm = _sm()
    req = sm.StateRequest()
    req.stateVariableRequest.listStateCall.stateName = "l"
    req.stateVariableRequest.listStateCall.listStatePut.value.append(b"x")
    data = req.SerializeToString()
    assert data != b""
    back = sm.StateRequest()
    back.ParseFromString(data)
    lsc = back.stateVariableRequest.listStateCall
    assert lsc.stateName == "l"
    assert list(lsc.listStatePut.value) == [b"x"]


@pytest.mark.skipif(MODE != "shim", reason="shim internals")
def test_sint_fields_rejected_not_corrupted():
    """sint32/sint64 use zigzag varints the shim does not implement; they
    must raise, never encode/decode silently wrong values."""
    rt = _rt()
    f = rt.FieldInfo("s", 1, 1, rt.TYPE_SINT64, "")
    with pytest.raises(TypeError):
        rt.ShimMessage._emit(bytearray(), f, -5)
    with pytest.raises(TypeError):
        rt.ShimMessage._coerce(f, 9)


def test_double_float_roundtrip_not_bit_pattern():
    """double/float fields must round-trip as IEEE values on BOTH paths —
    decode must reinterpret the fixed-width bits, never hand back the raw
    bit pattern as an int (silent corruption for any future pb2 module
    carrying float fields)."""
    import math
    import struct

    rt = _rt()
    for ftype, wt, fmt in ((rt.TYPE_DOUBLE, 1, "<d"), (rt.TYPE_FLOAT, 5, "<f")):
        f = rt.FieldInfo("x", 3, 1, ftype, "")
        for v in (0.5, -1.25, 3.0, float("inf")):
            out = bytearray()
            rt.ShimMessage._emit(out, f, v)
            fields = list(rt.iter_wire(bytes(out)))
            assert fields == [(3, wt, struct.unpack("<Q" if wt == 1 else "<I",
                                                    struct.pack(fmt, v))[0])]
            got = rt.ShimMessage._coerce(f, fields[0][2])
            assert isinstance(got, float) and got == v
        # NaN round-trips to NaN (not its bit pattern as a huge int)
        out = bytearray()
        rt.ShimMessage._emit(out, f, float("nan"))
        (_, _, raw), = rt.iter_wire(bytes(out))
        assert math.isnan(rt.ShimMessage._coerce(f, raw))


def test_mode_reporting_matches_resolution():
    from fs2_kafka_streams_spark.vendor import SHIM_DIR, ensure_protobuf

    import google.protobuf as gp

    mode = ensure_protobuf()
    resolved_shim = SHIM_DIR in (getattr(gp, "__file__", "") or "")
    assert (mode == "shim") == resolved_shim


# ---------------------------------------------------------------------------
# property-based round-trips (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)


@settings(max_examples=200, deadline=None)
@given(
    status=_i32,
    err=st.text(max_size=40),
    values=st.lists(st.binary(max_size=32), max_size=8),
    more=st.booleans(),
)
def test_list_response_roundtrip_property(status, err, values, more):
    sm = _sm()
    src = sm.StateResponseWithListGet(
        statusCode=status, errorMessage=err, value=values,
        requireNextFetch=more,
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(src.SerializeToString())
    assert back.statusCode == status
    assert back.errorMessage == err
    assert list(back.value) == values
    assert back.requireNextFetch == more


@settings(max_examples=200, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.binary(max_size=24), st.binary(max_size=24)), max_size=6
    ),
    ts=st.lists(_i64, max_size=6),
)
def test_map_iterator_and_timer_roundtrip_property(pairs, ts):
    sm = _sm()
    src = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=k, value=v) for k, v in pairs]
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(src.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == pairs

    src2 = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(timestampMs=t) for t in ts]
    )
    back2 = sm.StateResponseWithTimer()
    back2.ParseFromString(src2.SerializeToString())
    assert [x.timestampMs for x in back2.timer] == ts


@settings(max_examples=200, deadline=None)
@given(
    name=st.text(max_size=30),
    schema=st.text(max_size=60),
    ttl=st.integers(min_value=0, max_value=2**62),
)
def test_state_call_command_roundtrip_property(name, schema, ttl):
    sm = _sm()
    cmd = sm.StateCallCommand()
    cmd.stateName = name
    cmd.schema = schema
    cmd.ttl.durationMs = ttl
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == name
    assert got.schema == schema
    assert got.ttl.durationMs == ttl


@pytest.mark.skipif(MODE != "shim", reason="shim internals")
@settings(max_examples=200, deadline=None)
@given(
    d=st.floats(allow_nan=False, width=64),
    fl=st.floats(allow_nan=False, width=32),
)
def test_double_float_roundtrip_property(d, fl):
    """Property form of the double/float fix: arbitrary IEEE values emit as
    fixed64/fixed32 and decode back bit-exactly through _emit/_coerce —
    never as the raw bit pattern int."""
    rt = _rt()
    for ftype, v in ((rt.TYPE_DOUBLE, d), (rt.TYPE_FLOAT, fl)):
        f = rt.FieldInfo("x", 9, 1, ftype, "")
        out = bytearray()
        rt.ShimMessage._emit(out, f, v)
        (num, _wt, raw), = rt.iter_wire(bytes(out))
        got = rt.ShimMessage._coerce(f, raw)
        assert num == 9 and isinstance(got, float)
        import struct as _s

        fmt = "<d" if ftype == rt.TYPE_DOUBLE else "<f"
        assert _s.pack(fmt, got) == _s.pack(fmt, v)


def test_sfixed_fields_decode_signed():
    """sfixed32/sfixed64 are fixed-width but SIGNED: decode must restore
    the sign from the raw bit pattern (returning 2^64-5 for -5 would be
    silent corruption, inconsistent with the sint rejection policy)."""
    rt = _rt()
    f64 = rt.FieldInfo("x", 1, 1, rt.TYPE_SFIXED64, "")
    f32 = rt.FieldInfo("y", 2, 1, rt.TYPE_SFIXED32, "")
    assert rt.ShimMessage._coerce(f64, (1 << 64) - 5) == -5
    assert rt.ShimMessage._coerce(f64, 7) == 7
    assert rt.ShimMessage._coerce(f32, (1 << 32) - 9) == -9
    assert rt.ShimMessage._coerce(f32, 3) == 3


def test_singular_message_field_merges_across_occurrences():
    """proto3 merge rule: when the same SINGULAR message field number
    appears twice in one buffer (legal — produced by message
    concatenation), the occurrences MERGE; a replace would discard fields
    set only in the first chunk. Holds under both the shim and the real
    runtime (the real lib defines the rule)."""
    from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

    a = sm.StatefulProcessorCall()
    a.getValueState.stateName = "s1"
    b = sm.StatefulProcessorCall()
    b.getValueState.schema = "f int"
    merged = sm.StatefulProcessorCall()
    merged.ParseFromString(a.SerializeToString() + b.SerializeToString())
    assert merged.getValueState.stateName == "s1"
    assert merged.getValueState.schema == "f int"
