"""Unit tests for the vendored mini protobuf runtime
(lakehouse_v3_spark/vendor/google/protobuf) — the wire-format shim that
lets transformWithStateInPandas talk to the JVM state server in a
container without a google.protobuf wheel.

Golden-byte tests pin the encoder to the PUBLISHED wire spec with
hand-assembled literals, so a symmetric encode/decode bug cannot
cancel. The end-to-end proof is
tests/test_scale_ops.py::test_transform_with_state_distinct_types,
which runs a real streaming query through the shim.
"""

from __future__ import annotations

import pytest

from lakehouse_v3_spark.vendor import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

from lakehouse_v3_spark.vendor.google.protobuf import _mini_runtime as rt  # noqa: E402


def test_varint_roundtrip_and_golden():
    assert rt._enc_varint(0) == b"\x00"
    assert rt._enc_varint(1) == b"\x01"
    assert rt._enc_varint(300) == b"\xac\x02"  # spec's own example
    # negative int64 → 10-byte two's complement
    assert len(rt._enc_varint(-1)) == 10
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        dec, pos = rt._dec_varint(rt._enc_varint(v), 0)
        assert dec == v and pos == len(rt._enc_varint(v))


def test_message_golden_bytes():
    """StateRequest(version=2, setHandleState(CREATED)) must serialize
    to the exact spec bytes: field1 varint 2; field2 len-4 submessage
    {field1 len-2 {field1 varint 1}}."""
    m = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    assert m.SerializeToString() == bytes.fromhex("080212040a020801")


def test_parse_golden_bytes():
    m = sm.StateRequest()
    m.ParseFromString(bytes.fromhex("080212040a020801"))
    assert m.version == 2
    assert m.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_oneof_last_set_wins():
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand(stateName="a"))
    call.getMapState = sm.StateCallCommand(stateName="b")
    assert call.WhichOneof("method") == "getMapState"
    assert not call.HasField("getValueState")
    parsed = sm.StatefulProcessorCall()
    parsed.ParseFromString(call.SerializeToString())
    assert parsed.WhichOneof("method") == "getMapState"
    assert parsed.getMapState.stateName == "b"


def test_repeated_bytes_and_bool():
    r = sm.StateResponseWithListGet(
        statusCode=0, value=[b"", b"x", b"\x00\xff"], requireNextFetch=True
    )
    r2 = sm.StateResponseWithListGet()
    r2.ParseFromString(r.SerializeToString())
    assert r2.value == [b"", b"x", b"\x00\xff"]
    assert r2.requireNextFetch is True
    assert r2.statusCode == 0  # explicit default survives


def test_repeated_message_kvpairs():
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=False,
    )
    out = sm.StateResponseWithMapIterator()
    out.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in out.kvPair] == [(b"k1", b"v1"), (b"k2", b"v2")]


def test_negative_and_large_int64():
    for v in (-1, -(2**62), 2**62, 0):
        t = sm.RegisterTimer(expiryTimestampMs=v)
        t2 = sm.RegisterTimer()
        t2.ParseFromString(t.SerializeToString())
        assert t2.expiryTimestampMs == v


def test_unknown_fields_skipped():
    """A message with extra fields (newer schema) must parse cleanly —
    forward compatibility is part of the wire contract."""
    base = sm.StateResponse(statusCode=7, errorMessage="boom").SerializeToString()
    unknown = (
        rt._enc_varint((99 << 3) | 2) + rt._enc_varint(3) + b"abc"  # len-delim
        + rt._enc_varint(98 << 3) + rt._enc_varint(5)  # varint
    )
    m = sm.StateResponse()
    m.ParseFromString(base + unknown)
    assert m.statusCode == 7 and m.errorMessage == "boom"


def test_packed_varint_accepted_on_parse():
    """proto3 encoders may pack repeated varints; the shim must accept
    the packed form even though it never emits one (StateMessage has no
    repeated numeric fields, but robustness is cheap to pin)."""
    fd = rt.FieldDesc("xs", 1, rt.LABEL_REPEATED, rt.T_INT64, "", None, False)
    desc = rt.MsgDesc("Packed", [fd], [])
    cls = type("Packed", (rt.MiniMessage,), {
        "DESCRIPTOR": desc, "_fields_by_name": {"xs": fd},
    })
    payload = b"".join(rt._enc_varint(v) for v in (3, 270, 86942))
    wire = rt._enc_varint((1 << 3) | 2) + rt._enc_varint(len(payload)) + payload
    m = cls()
    m.ParseFromString(wire)
    assert m.xs == [3, 270, 86942]


def test_unset_field_defaults():
    m = sm.StateResponse()
    assert m.statusCode == 0 and m.errorMessage == "" and m.value == b""
    assert sm.StateResponseWithListGet().value == []
    # unset message field reads as a default instance
    assert sm.StateRequest().statefulProcessorCall.setHandleState.state == 0


def test_unknown_kwarg_rejected():
    with pytest.raises(AttributeError):
        sm.StateResponse(nope=1)


def test_descriptor_parser_matches_generated_metadata():
    """The descriptor parser consumed protoc's own serialized
    FileDescriptorProto — spot-check structure against the known
    schema."""
    # must use the canonical import name: the vendored path would be a
    # SEPARATE module instance with its own (empty) default pool
    from google.protobuf import descriptor_pool

    pool = descriptor_pool.Default()
    req = pool.message_classes[
        "org.apache.spark.sql.execution.streaming.state.StateRequest"
    ]
    names = [f.name for f in req.DESCRIPTOR.fields]
    assert names[:2] == ["version", "statefulProcessorCall"]
    assert req.DESCRIPTOR.oneofs == ["method"]
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5


def test_truncated_fixed_width_raises():
    """Wire types 1/5 must bounds-check like the length-delimited path:
    a truncated fixed64/fixed32 payload is a corrupt message, not a
    silently-short slice (ADVICE r4)."""
    # tag field1/wt1 (fixed64) followed by only 3 payload bytes
    with pytest.raises(ValueError, match="truncated fixed64"):
        rt._raw_parse(b"\x09\x01\x02\x03")
    # tag field1/wt5 (fixed32) followed by only 2 payload bytes
    with pytest.raises(ValueError, match="truncated fixed32"):
        rt._raw_parse(b"\x0d\x01\x02")


def test_repeated_field_append_attaches():
    """msg.repeated.append(x) — the mutation pattern real protobuf
    supports — must persist into the serialized message, not vanish
    into a detached list (ADVICE r4)."""
    r = sm.StateResponseWithListGet(statusCode=0)
    r.value.append(b"k1")
    r.value.append(b"k2")
    out = sm.StateResponseWithListGet()
    out.ParseFromString(r.SerializeToString())
    assert out.value == [b"k1", b"k2"]
    # read-only access of an unset repeated field stays wire-invisible
    # and equality-neutral
    probe = sm.StateResponseWithListGet(statusCode=0)
    assert probe.requireNextFetch is False  # scalar read, no attach
    touched = sm.StateResponseWithListGet(statusCode=0)
    assert touched.value == []  # attaches an empty list
    assert touched.SerializeToString() == probe.SerializeToString()
    assert touched == probe


def test_unset_submessage_mutation_is_loud():
    """Real protobuf attaches msg.sub on first write; the mini runtime
    does not implement parent attachment, so writing through the
    detached default must raise instead of silently dropping data
    (ADVICE r4). Reads of nested defaults keep working."""
    req = sm.StateRequest()
    assert req.statefulProcessorCall.setHandleState.state == 0  # reads OK
    with pytest.raises(NotImplementedError, match="unset message field"):
        req.statefulProcessorCall.version = 1
    with pytest.raises(NotImplementedError, match="unset message field"):
        req.statefulProcessorCall.MergeFromString(b"")
    # the refused write must not have attached anything
    assert not req.HasField("statefulProcessorCall")
