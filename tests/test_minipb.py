"""Wire-format tests for the vendored minimal protobuf runtime.

The runtime (fbs_data_pipelines_spark/_vendor/google/protobuf) exists
to let transformWithStateInPandas speak Spark's protobuf state
protocol in an environment with no protobuf wheel. These tests pin
the wire format against hand-computed golden bytes (the protocol is
spoken to a JVM peer — compatibility is the whole point) and the
generated-module integration that pyspark's state clients rely on.
"""

from __future__ import annotations

import pytest

# activation (idempotent): appends the vendor dir if needed
from fbs_data_pipelines_spark.streaming.stateful import HAS_TWS_DEPS

if not HAS_TWS_DEPS:  # pragma: no cover
    pytest.skip("protobuf unavailable even vendored", allow_module_level=True)

from google.protobuf import minipb  # noqa: E402  (vendored or real-adjacent)


def test_varint_roundtrip_and_negatives():
    cases = [0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**31]
    for v in cases:
        enc = minipb.encode_varint(v)
        dec, pos = minipb.read_varint(enc, 0)
        assert pos == len(enc)
        expect = v & ((1 << 64) - 1)
        assert dec == expect
    # golden: 300 -> ac 02 (protobuf.dev encoding example)
    assert minipb.encode_varint(300) == b"\xac\x02"
    # golden: -1 as int64 -> ten 0xff… bytes ending 0x01
    assert minipb.encode_varint(-1) == b"\xff" * 9 + b"\x01"


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_golden_state_request_bytes():
    sm = _sm()
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        ),
    )
    # field 1 varint 2 | field 2 LEN(4) | field 1 LEN(2) | field 1 varint 2
    assert req.SerializeToString() == bytes.fromhex("080212040a020802")


def test_explicit_presence_empty_submessage_serialized():
    sm = _sm()
    # an EMPTY submessage set into a oneof must still hit the wire —
    # the JVM dispatches on which oneof member is present
    req = sm.StateVariableRequest(valueStateCall=sm.ValueStateCall(get=sm.Get()))
    data = req.SerializeToString()
    assert data  # not empty
    back = sm.StateVariableRequest()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "valueStateCall"


def test_default_scalars_not_serialized():
    sm = _sm()
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"


def test_oneof_set_clears_peers():
    sm = _sm()
    req = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall())
    req.stateVariableRequest = sm.StateVariableRequest()
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "stateVariableRequest"


def test_repeated_message_roundtrip():
    sm = _sm()
    msg = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(msg.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is True


def test_unknown_fields_skipped():
    sm = _sm()
    # field 999 varint 5 prepended to a valid StateResponse payload
    unknown = minipb._tag(999, 0) + minipb.encode_varint(5)
    known = sm.StateResponse(statusCode=7).SerializeToString()
    back = sm.StateResponse()
    back.ParseFromString(unknown + known)
    assert back.statusCode == 7


def test_negative_int_roundtrip_through_message():
    sm = _sm()
    # statusCode is int32; negative values take the 10-byte varint path
    msg = sm.StateResponse(statusCode=-3)
    back = sm.StateResponse()
    back.ParseFromString(msg.SerializeToString())
    assert back.statusCode == -3


def test_string_fields_utf8():
    sm = _sm()
    msg = sm.StateResponse(statusCode=1, errorMessage="état ✓")
    back = sm.StateResponse()
    back.ParseFromString(msg.SerializeToString())
    assert back.errorMessage == "état ✓"


def test_enum_constants_hoisted():
    sm = _sm()
    assert sm.PRE_INIT == 0
    assert sm.HandleState.Value("INITIALIZED") == sm.INITIALIZED
    assert sm.HandleState.Name(sm.INITIALIZED) == "INITIALIZED"


def test_vendor_never_shadows_real_protobuf():
    # the activation shim APPENDS the vendor dir; a real protobuf
    # install earlier on sys.path would win. Assert the path discipline.
    import sys

    vendor_entries = [p for p in sys.path if p.endswith("_vendor")]
    if vendor_entries:  # vendored mode
        assert sys.path.index(vendor_entries[0]) > 0


# --- property-based round-trip over every generated message type --------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False


if HAS_HYPOTHESIS:

    def _scalar_strategy(fd):
        if fd.type == minipb.TYPE_STRING:
            return st.text(max_size=40)
        if fd.type == minipb.TYPE_BYTES:
            return st.binary(max_size=40)
        if fd.type == minipb.TYPE_BOOL:
            return st.booleans()
        if fd.type in (minipb.TYPE_UINT32, minipb.TYPE_UINT64):
            return st.integers(min_value=0, max_value=2**63 - 1)
        if fd.type == minipb.TYPE_ENUM:
            return st.integers(min_value=0, max_value=5)
        return st.integers(min_value=-(2**62), max_value=2**62)

    def _all_message_classes():
        sm = _sm()
        file_des = sm.DESCRIPTOR
        return sorted(
            file_des.message_classes.items(), key=lambda kv: kv[0]
        )

    @settings(max_examples=30, deadline=None)
    @given(data=st.data())
    def test_random_scalar_roundtrip_every_message(data):
        """For every message type in StateMessage.proto: populate every
        non-message, non-repeated field with random values (one oneof
        member per oneof), serialize, reparse, and require value
        equality — catches encode/decode asymmetries the golden-byte
        tests cannot cover."""
        for full_name, cls in _all_message_classes():
            kwargs = {}
            seen_oneofs = set()
            for fd in cls._fields_sorted:
                if fd.repeated or fd.type == minipb.TYPE_MESSAGE:
                    continue
                if fd.oneof is not None:
                    if fd.oneof in seen_oneofs:
                        continue
                    seen_oneofs.add(fd.oneof)
                kwargs[fd.name] = data.draw(
                    _scalar_strategy(fd), label=f"{full_name}.{fd.name}"
                )
            msg = cls(**kwargs)
            back = cls()
            back.ParseFromString(msg.SerializeToString())
            for name, val in kwargs.items():
                assert getattr(back, name) == val, (full_name, name)
            # reserialization is byte-stable (field order by number)
            assert back.SerializeToString() == msg.SerializeToString()
