"""Unit gates for the mini-protobuf shim (shims/google/protobuf).

The authoritative compatibility check is the TWS end-to-end tests in
tests/test_streaming.py (the JVM's real protobuf parses every request the
shim serializes and vice versa). These tests pin the wire-format details
that an e2e failure would surface only as an opaque JVM error: golden
bytes computed by hand from the public encoding spec
(https://protobuf.dev/programming-guides/encoding/), presence semantics,
oneof switching, negative varints, and unknown-field skipping.

Skipped entirely when the REAL protobuf runtime is installed — then the
shim is inert and these details are protobuf's own business.
"""

from __future__ import annotations

import pytest

from kasper_spark.protoshim import ensure_protobuf

if ensure_protobuf() != "shim":
    pytest.skip("real protobuf installed; shim inert", allow_module_level=True)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_golden_bytes_nested_oneof():
    """StateRequest{stateVariableRequest{valueStateCall{stateName, exists}}}
    — every byte derived by hand: field 3 LEN -> 0x1a, field 1 LEN -> 0x0a,
    string field 1 -> 0x0a + len + utf8, empty message field 2 -> 0x12 0x00."""
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(stateName="myState", exists=sm.Exists())
        )
    )
    assert req.SerializeToString().hex() == "1a0d0a0b0a076d7953746174651200"


def test_golden_bytes_enum_and_int():
    """SetHandleState(state=INITIALIZED=2) nested in StatefulProcessorCall:
    0x12 len 0x0a len 0x08 0x02 — enum encodes as a plain varint."""
    msg = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert msg.SerializeToString().hex() == "12040a020802"


def test_proto3_default_scalars_are_omitted():
    # statusCode=0, errorMessage="", value=b"" -> nothing on the wire
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # bool False omitted; True emitted
    assert sm.ListStatePut(fetchWithArrow=False).SerializeToString() == b""
    assert sm.ListStatePut(fetchWithArrow=True).SerializeToString().hex() == "1001"


def test_reading_submessage_does_not_mark_presence():
    """The TTLConfig trap: pyspark reads cmd.ttl only when a TTL is
    configured — if a mere read marked presence, every state variable
    would ship ttl{durationMs:0} and the JVM would enable 0 ms expiry."""
    cmd = sm.StateCallCommand(stateName="x")
    _ = cmd.ttl.durationMs  # read only
    assert cmd.SerializeToString() == sm.StateCallCommand(stateName="x").SerializeToString()
    cmd.ttl.durationMs = 5000  # write: presence must propagate up
    assert b"\x88\x27" in cmd.SerializeToString()  # varint 5000 present


def test_oneof_switch_clears_previous_member():
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    assert call.WhichOneof("method") == "exists"
    call2 = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert call2.WhichOneof("method") == "get"


def test_negative_int64_roundtrip():
    raw = sm.RegisterTimer(expiryTimestampMs=-1).SerializeToString()
    # -1 as 64-bit two's-complement varint: ten 0xff.. bytes
    assert raw.hex() == "08ffffffffffffffffff01"
    back = sm.RegisterTimer()
    back.ParseFromString(raw)
    assert back.expiryTimestampMs == -1


def test_repeated_bytes_and_messages_roundtrip():
    resp = sm.StateResponseWithMapIterator(
        statusCode=1,
        errorMessage="e",
        kvPair=[sm.KeyAndValuePair(key=b"k", value=b"v"),
                sm.KeyAndValuePair(key=b"k2", value=b"v2")],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [(b"k", b"v"), (b"k2", b"v2")]
    assert back.statusCode == 1 and back.errorMessage == "e" and back.requireNextFetch

    lst = sm.StateResponseWithListGet(statusCode=0, value=[b"a", b"", b"ccc"])
    back2 = sm.StateResponseWithListGet()
    back2.ParseFromString(lst.SerializeToString())
    assert list(back2.value) == [b"a", b"", b"ccc"]


def test_unknown_fields_are_skipped():
    """Forward compatibility: a response carrying a field this shim does
    not know (e.g. from a newer Spark) must parse, not raise. Field 15
    varint + field 14 length-delimited prepended to a valid payload."""
    base = sm.StateResponse(statusCode=3).SerializeToString()
    unknown = bytes([15 << 3 | 0, 42, 14 << 3 | 2, 2, 0xAB, 0xCD])
    msg = sm.StateResponse()
    msg.ParseFromString(unknown + base)
    assert msg.statusCode == 3


def test_fields_serialize_in_number_order():
    resp = sm.StateResponse(value=b"v", statusCode=2, errorMessage="x")
    assert resp.SerializeToString().hex() == "0802" + "120178" + "1a0176"


def test_ship_shim_to_workers_is_idempotent(spark):
    """The worker-injection route used by streaming_tws_count_twin under
    the grading driver's bare session: sc.environment must gain the shims
    dir exactly once (PythonFunction envVars snapshot this dict at UDF
    creation), and repeated calls must not grow the path."""
    import os as _os

    from kasper_spark.protoshim import _SHIMS_DIR, ship_shim_to_workers

    env = spark.sparkContext.environment
    saved = env.get("PYTHONPATH")
    try:
        assert ship_shim_to_workers(spark) is True
        first = env["PYTHONPATH"]
        assert _SHIMS_DIR in first.split(_os.pathsep)
        assert ship_shim_to_workers(spark) is True
        assert env["PYTHONPATH"] == first
    finally:
        if saved is None:
            env.pop("PYTHONPATH", None)
        else:
            env["PYTHONPATH"] = saved


def test_copyfrom_into_vivified_child_golden_bytes():
    """CopyFrom routes through ParseFromString, which must count as a
    WRITE to the auto-vivified child: the parent chain marks the field
    present and the sub-message reaches the wire. Before the fix the ttl
    config below silently vanished (serialized to just 0a0178) — a JVM
    state server would never see the TTL. Bytes derived by hand: field 4
    LEN -> 0x22, len 3, field 1 varint 5000 -> 08 88 27."""
    cmd = sm.StateCallCommand(stateName="x")
    cmd.ttl.CopyFrom(sm.TTLConfig(durationMs=5000))
    assert cmd.HasField("ttl")
    assert cmd.SerializeToString().hex() == "0a01782203088827"
    # an all-defaults CopyFrom is still a write: empty sub-message on wire
    bare = sm.StateCallCommand()
    bare.ttl.CopyFrom(sm.TTLConfig())
    assert bare.HasField("ttl")
    assert bare.SerializeToString().hex() == "2200"


def test_parse_oneof_last_wins():
    """A wire payload carrying two members of the same oneof keeps only
    the LAST (proto3 last-wins): the earlier member must be evicted from
    presence, not accumulate."""
    a = sm.StateVariableRequest(valueStateCall=sm.ValueStateCall(stateName="v"))
    b = sm.StateVariableRequest(listStateCall=sm.ListStateCall(stateName="l"))
    merged = sm.StateVariableRequest()
    merged._merge(a.SerializeToString())
    merged._merge(b.SerializeToString())
    assert merged.WhichOneof("method") == "listStateCall"
    assert not merged.HasField("valueStateCall")


def test_shim_is_namespace_portion(tmp_path):
    """shims/google must stay a NAMESPACE portion (no __init__.py): a
    regular package would (a) fail to activate when another google.*
    distribution already cached the namespace, and (b) shadow that other
    distribution once active. Run the two-portion scenario in a clean
    interpreter."""
    import os as _os
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    other = tmp_path / "portions"
    (other / "google" / "auth").mkdir(parents=True)
    (other / "google" / "auth" / "__init__.py").write_text("X = 'auth-ok'\n")
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(other)!r})\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import google.auth\n"  # caches namespace 'google' WITHOUT the shim
        "from kasper_spark.protoshim import ensure_protobuf\n"
        "assert ensure_protobuf() == 'shim'\n"
        "import google.protobuf\n"
        "import google.auth as ga\n"
        "assert ga.X == 'auth-ok'\n"
        "print('coexist-ok')\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env={"PATH": "/usr/bin:/bin"},
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "coexist-ok" in out.stdout


def test_evicted_oneof_child_is_detached():
    """A kept reference to an evicted oneof member must become a
    free-standing message: writing through it must NOT re-mark the field
    present on the original parent (which would serialize a
    present-but-valueless field and crash) — matching real protobuf,
    where the evicted sub-message is simply detached."""
    m = sm.StateVariableRequest()
    m._merge(
        sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(stateName="v")
        ).SerializeToString()
    )
    kept = m.valueStateCall
    m._merge(
        sm.StateVariableRequest(
            listStateCall=sm.ListStateCall(stateName="l")
        ).SerializeToString()
    )
    assert m.WhichOneof("method") == "listStateCall"
    kept.stateName = "stale-write"  # free-standing now: must not leak back
    assert m.WhichOneof("method") == "listStateCall"
    assert not m.HasField("valueStateCall")
    m.SerializeToString()  # present-but-valueless would KeyError here
    # same contract for ParseFromString's wholesale replacement
    p = sm.StateCallCommand(stateName="x")
    p.ttl.CopyFrom(sm.TTLConfig(durationMs=5))
    stale_child = p.ttl
    p.ParseFromString(sm.StateCallCommand(stateName="y").SerializeToString())
    stale_child.durationMs = 99
    assert not p.HasField("ttl")
    assert p.SerializeToString().hex() == "0a0179"


def test_packed_wire_type_on_varint_field_raises():
    """A wire-type-2 payload for a declared varint field (packed repeated
    encoding, or corruption) must raise — decoding the length byte as the
    value would silently misalign the rest of the stream. statusCode is
    field 1 TYPE_INT32: tag 0x0a = field 1 wire type 2."""
    bad = bytes([1 << 3 | 2, 0x02, 0x01, 0x02])
    msg = sm.StateResponse()
    with pytest.raises(ValueError, match="wire type 2"):
        msg.ParseFromString(bad)
