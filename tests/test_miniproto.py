"""Wire-format unit tests for the vendored minimal protobuf runtime
(_vendor/google/protobuf/internal/_runtime.py) — the proto3 subset the
transformWithStateInPandas state protocol uses. The end-to-end proof is
tests/test_stateful_tws.py (live JVM state server both directions); these
pin the codec's edge cases independently."""

from __future__ import annotations

import pytest

from timing_explorer_spark.compat import ensure_protobuf

MODE = ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

from timing_explorer_spark._vendor.google.protobuf.internal import (  # noqa: E402
    _runtime as rt,
)


def test_varint_edges():
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**63):
        out = bytearray()
        rt.write_varint(out, v)
        got, pos = rt.read_varint(bytes(out), 0)
        assert pos == len(out)
        assert rt._signed64(got) == v
    # -1 is the canonical 10-byte varint
    out = bytearray()
    rt.write_varint(out, -1)
    assert bytes(out) == b"\xff" * 9 + b"\x01"


def test_known_byte_layout():
    """Hand-checked encoding: StateRequest{statefulProcessorCall{
    setHandleState{state=INITIALIZED}}} == 12 04 0a 02 08 02."""
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")


def test_proto3_default_elision_and_equivalence():
    """Zero-valued plain scalars are not emitted (canonical proto3), and the
    decoded message still reads them as defaults."""
    r = sm.StateResponse(statusCode=0, errorMessage="", value=b"")
    assert r.SerializeToString() == b""
    back = sm.StateResponse()
    back.ParseFromString(b"")
    assert back.statusCode == 0 and back.errorMessage == "" and back.value == b""


def test_oneof_set_clears_siblings():
    req = sm.ImplicitGroupingKeyRequest(setImplicitKey=sm.SetImplicitKey(key=b"k"))
    assert req.WhichOneof("method") == "setImplicitKey"
    req.removeImplicitKey = sm.RemoveImplicitKey()
    assert req.WhichOneof("method") == "removeImplicitKey"
    assert not req.HasField("setImplicitKey")
    # the newly-set empty message still serializes (presence via oneof)
    assert req.SerializeToString() == bytes.fromhex("1200")


def test_unknown_fields_skipped():
    """Forward compatibility: bytes containing an unknown field parse fine
    (varint, length-delimited, and 32/64-bit wiretypes all skippable)."""
    known = sm.StateResponse(statusCode=7).SerializeToString()
    unknown = (
        bytes([15 << 3 | 0, 1])  # field 15 varint
        + bytes([14 << 3 | 2, 3]) + b"xyz"  # field 14 LD len 3
        + bytes([13 << 3 | 5]) + b"\x00" * 4  # field 13 32-bit
        + bytes([12 << 3 | 1]) + b"\x00" * 8  # field 12 64-bit
    )
    r = sm.StateResponse()
    r.ParseFromString(unknown + known)
    assert r.statusCode == 7


def test_repeated_message_and_add():
    t = sm.StateResponseWithTimer()
    t.timer.add(timestampMs=11)
    t.timer.add(key=b"x", timestampMs=22)
    b = t.SerializeToString()
    back = sm.StateResponseWithTimer()
    back.ParseFromString(b)
    assert [(x.timestampMs, x.HasField("key")) for x in back.timer] == [
        (11, False),
        (22, True),
    ]


def test_truncated_raises():
    with pytest.raises(Exception):
        sm.StateResponse().ParseFromString(bytes([1 << 3 | 2, 10, 1, 2]))


def test_utf8_strings_roundtrip():
    r = sm.StateResponseWithStringTypeVal(statusCode=1, value="héllo 𝕊")
    back = sm.StateResponseWithStringTypeVal()
    back.ParseFromString(r.SerializeToString())
    assert back.value == "héllo 𝕊"


def test_real_runtime_preferred_when_present():
    """The shim only activates when google.protobuf is absent; in this
    container that means MODE == 'vendored'. On a standard image the same
    call reports 'real' and the vendored tree is never imported."""
    assert MODE in ("real", "vendored")
    import google.protobuf

    if MODE == "vendored":
        assert "_vendor" in google.protobuf.__file__


def test_property_roundtrip_random_messages():
    """Hypothesis: any combination of field values round-trips bit-exactly
    through SerializeToString/ParseFromString — including int64 extremes,
    empty/large bytes, unicode strings, and repeated containers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)

    @settings(max_examples=200, deadline=None)
    @given(
        code=i32,
        msg=st.text(max_size=60),
        val=st.binary(max_size=200),
        vals=st.lists(st.binary(max_size=40), max_size=8),
        more=st.booleans(),
        ts=st.lists(st.tuples(st.binary(max_size=10), i64), max_size=6),
    )
    def run(code, msg, val, vals, more, ts):
        r = sm.StateResponse(statusCode=code, errorMessage=msg, value=val)
        back = sm.StateResponse()
        back.ParseFromString(r.SerializeToString())
        assert (back.statusCode, back.errorMessage, bytes(back.value)) == (
            code,
            msg,
            val,
        )
        lg = sm.StateResponseWithListGet(
            statusCode=code, value=vals, requireNextFetch=more
        )
        back2 = sm.StateResponseWithListGet()
        back2.ParseFromString(lg.SerializeToString())
        assert [bytes(v) for v in back2.value] == vals
        assert back2.requireNextFetch == more
        t = sm.StateResponseWithTimer(
            statusCode=code,
            timer=[sm.TimerInfo(key=k, timestampMs=n) for k, n in ts],
        )
        back3 = sm.StateResponseWithTimer()
        back3.ParseFromString(t.SerializeToString())
        assert [(bytes(x.key), x.timestampMs) for x in back3.timer] == ts

    run()


def test_unset_submessage_view_is_frozen():
    """Reading an unset singular message field yields a read-only default
    view: in-place mutation raises instead of being silently discarded
    (this runtime does not auto-vivify like real protobuf — ADVICE r4)."""
    req = sm.StateRequest()
    view = req.statefulProcessorCall  # unset -> frozen default view
    assert req.SerializeToString() == b""  # reading did not set the field
    with pytest.raises(AttributeError, match="auto-vivify"):
        view.setHandleState = sm.SetHandleState(state=sm.INITIALIZED)
    # repeated fields of a frozen view also fail loudly rather than vanish
    timer_resp = sm.StateResponseWithTimer()
    # construct a frozen view whose type has a repeated field
    frozen = sm.StateRequest().statefulProcessorCall
    for fname, fd in frozen.DESCRIPTOR.fields_by_name.items():
        if fd.repeated:
            # EVERY list mutator must fail loudly on a frozen view, not just
            # append/extend (ADVICE r5: insert/__setitem__/__iadd__/remove/...
            # would otherwise mutate silently and the change is discarded)
            c = getattr(frozen, fname)
            for mutate in (
                lambda: c.append(b"x"),
                lambda: c.extend([b"x"]),
                lambda: c.insert(0, b"x"),
                lambda: c.__setitem__(0, b"x"),
                lambda: c.__delitem__(0),
                lambda: c.__iadd__([b"x"]),
                lambda: c.remove(b"x"),
                lambda: c.clear(),
                lambda: c.pop(),
                lambda: c.sort(),
                lambda: c.reverse(),
            ):
                with pytest.raises(AttributeError, match="unset submessage"):
                    mutate()
            assert list(c) == []  # nothing leaked through
            break
    # the supported construct-and-assign path still works
    req.statefulProcessorCall = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")
    assert timer_resp.SerializeToString() == b""


def test_vendored_google_is_namespace_extending():
    """The vendored google/__init__.py must not shadow other installed
    google.* distributions: it extends __path__ with every google dir on
    sys.path (pkgutil.extend_path) instead of claiming the namespace."""
    import google

    if "_vendor" not in google.__file__:
        pytest.skip("real protobuf installed; vendor tree inactive")
    src = open(google.__file__).read()
    assert "extend_path" in src
