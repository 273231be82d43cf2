"""Wire-format tests for the pure-Python protobuf shim (streaming/pbshim).

No Spark needed: golden byte strings are hand-derived from the public
proto3 wire format (tag = field_number<<3 | wire_type; varints LEB128;
length-delimited strings/bytes/messages). The end-to-end proof that the
JVM accepts these bytes is q_stream_run_tws (oracle-gated) and
test_stateful_running_totals_tws; these tests pin the encoding rules so
a regression is caught without a streaming query.
"""

from __future__ import annotations

import pytest

from cellbase_spark.streaming import pbshim

mod = pbshim.build_module()


def test_golden_set_handle_state():
    # StateRequest.statefulProcessorCall (field 2, oneof) wrapping
    # StatefulProcessorCall.setHandleState (field 1, oneof) wrapping
    # SetHandleState(state=PRE_INIT=0): enum default, but the oneof
    # membership forces emission of the empty submessages.
    req = mod.StateRequest(
        statefulProcessorCall=mod.StatefulProcessorCall(
            setHandleState=mod.SetHandleState(state=mod.PRE_INIT)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12020a00")


def test_golden_nested_write_through_and_roundtrip():
    scc = mod.StateCallCommand()
    scc.stateName = "totals"
    scc.schema = "s"
    scc.ttl.durationMs = 5000  # write-through must mark ttl present
    b = scc.SerializeToString()
    # 0a 06 'totals' | 12 01 's' | 22 03 { 08 88 27 }
    assert b == bytes.fromhex("0a06746f74616c73120173" "2203088827")
    back = mod.StateCallCommand()
    back.ParseFromString(b)
    assert back.stateName == "totals"
    assert back.ttl.durationMs == 5000


def test_untouched_submessage_not_serialized():
    scc = mod.StateCallCommand()
    scc.stateName = "x"
    _ = scc.ttl.durationMs  # read-only touch: default 0, no presence
    assert b"\x22" not in scc.SerializeToString()  # no ttl field (num 4)


def test_proto3_scalar_defaults_skipped_but_oneof_emitted():
    # non-oneof scalar at default -> absent
    resp = mod.StateResponse(statusCode=0)
    assert resp.SerializeToString() == b""
    # oneof member at default -> still emitted
    req = mod.ImplicitGroupingKeyRequest(setImplicitKey=mod.SetImplicitKey(key=b""))
    assert req.SerializeToString() == bytes.fromhex("0a00")


def test_oneof_last_write_wins():
    req = mod.ImplicitGroupingKeyRequest(
        setImplicitKey=mod.SetImplicitKey(key=b"k")
    )
    req.removeImplicitKey = mod.RemoveImplicitKey()
    b = req.SerializeToString()
    # only field 2 (removeImplicitKey) survives
    assert b == bytes.fromhex("1200")


def test_negative_int64_ten_byte_varint():
    m = mod.StateResponseWithLongTypeVal(value=-7)
    b = m.SerializeToString()
    # field 3 varint: tag 0x18, then 10-byte two's-complement varint
    assert b[0] == 0x18 and len(b) == 11
    back = mod.StateResponseWithLongTypeVal()
    back.ParseFromString(b)
    assert back.value == -7


def test_repeated_bytes_roundtrip_and_unknown_fields_skipped():
    m = mod.ListStatePut()
    m.value.extend([b"a", b"bb", b""])
    b = m.SerializeToString()
    back = mod.ListStatePut()
    # prepend an unknown field (number 1000, varint) — parser must skip it
    unknown = bytes.fromhex("c03e01")  # tag (1000<<3|0) varint, value 1
    back.ParseFromString(unknown + b)
    assert list(back.value) == [b"a", b"bb", b""]


def test_repeated_message_add_and_parse():
    resp = mod.StateResponseWithTimer(statusCode=1)
    t = resp.timer.add()
    t.timestampMs = 42
    b = resp.SerializeToString()
    back = mod.StateResponseWithTimer()
    back.ParseFromString(b)
    assert back.statusCode == 1
    assert [x.timestampMs for x in back.timer] == [42]


def test_unknown_attribute_rejected():
    with pytest.raises(AttributeError):
        mod.StateResponse().nope
    with pytest.raises(AttributeError):
        mod.StateResponse().nope = 1


def test_install_is_idempotent_and_shadows_pb2():
    import sys

    assert pbshim.install() is True  # google.protobuf absent here
    first = sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"]
    assert pbshim.install() is True
    assert sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"] is first
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    assert sm.StateRequest is first.StateRequest


def test_enum_constants_at_module_level():
    assert mod.PRE_INIT == 0
    assert mod.CLOSED == 5
