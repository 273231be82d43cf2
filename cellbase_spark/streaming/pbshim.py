"""Pure-Python protobuf shim for Spark's transformWithStateInPandas.

The TWS Python worker speaks a protobuf protocol (StateMessage.proto) to
the JVM over a socket, via classes generated into
``pyspark/sql/streaming/proto/StateMessage_pb2.py``. That generated file
needs the ``google.protobuf`` runtime, which is absent in this container
and cannot be installed — the one capability gap in the streaming family
(SURVEY.md §2 U6).

The protocol itself, however, is tiny: 47 flat messages over six wire
types (varint int32/int64/bool/enum, length-delimited string/bytes/
message; repeated only for bytes and messages — see
``_statemessage_schema.py``, generated from the descriptor embedded in
the installed pyspark). The proto3 wire format is public, stable and
simple, so this module implements just enough of a protobuf runtime to
run that protocol:

- ``MiniMessage``: descriptor-driven message base — kwarg construction,
  attribute get/set, auto-vivified singular submessages that mark the
  parent chain present on first field write (the pure-python protobuf
  "listener" semantics), ``SerializeToString`` / ``ParseFromString``.
- ``build_module()``: a module object exposing one class per message
  plus top-level enum constants — the exact surface pyspark's
  stateful_processor_api_client / value_state_client / list_state_client
  / map_state_client use (they call no descriptor/reflection APIs:
  verified by grep — no WhichOneof/HasField/CopyFrom).
- ``install()``: drops that module into
  ``sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"]`` when
  (and only when) the real google.protobuf runtime is unavailable. All
  pyspark imports of the pb2 module are function-local, so installing
  before the first state call is sufficient; importing
  cellbase_spark.streaming.tws does it, which also happens inside the
  Python worker when the pickled StatefulProcessor is loaded.

Serialization notes (proto3 semantics):
- scalar fields are emitted only when != default, EXCEPT oneof members,
  which are emitted whenever they are the active member (even default);
- singular submessages are emitted when present (assigned, parsed, or
  written-through);
- repeated fields are emitted element-wise (unpacked — always valid on
  the wire; the JVM may send packed varints, which the parser accepts,
  though this schema has no repeated varint fields);
- negative int32/int64 are encoded as 10-byte two's-complement varints,
  exactly like the reference implementation.
"""

from __future__ import annotations

import sys
import types as _types

from cellbase_spark.streaming._statemessage_schema import (
    ENUMS,
    MESSAGES,
    PACKAGE,
)

_WT_VARINT = 0
_WT_LEN = 2
_VARINT_TYPES = ("int32", "int64", "bool", "enum")
_DEFAULTS = {"int32": 0, "int64": 0, "bool": False, "enum": 0,
             "string": "", "bytes": b""}


def _encode_varint(value: int) -> bytes:
    if value < 0:
        value += 1 << 64  # two's-complement 64-bit, like protobuf
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _decode_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _tag(number: int, wt: int) -> bytes:
    return _encode_varint((number << 3) | wt)


class _Repeated(list):
    """Repeated-field container: list that marks its owner present when
    it first becomes non-empty (so an empty touched container does not
    serialize, but .append/.extend make the chain stick)."""

    def __init__(self, owner: "MiniMessage"):
        super().__init__()
        self._owner = owner

    def _touch(self) -> None:
        self._owner._mark_present()

    def append(self, x):  # noqa: D102
        super().append(x)
        self._touch()

    def extend(self, xs):  # noqa: D102
        super().extend(xs)
        if len(self):
            self._touch()

    def add(self, **kwargs):
        """protobuf's repeated-message add(): construct, append, return."""
        raise NotImplementedError  # replaced per-field in MiniMessage


class MiniMessage:
    """Base for the generated message classes. Subclasses carry
    ``_FIELDS`` (name -> field dict), ``_BY_NUMBER`` and ``_ONEOFS``."""

    _FIELDS: dict = {}
    _BY_NUMBER: dict = {}
    _ONEOFS: list = []
    _CLASSES: dict = {}  # short type name -> class, shared registry

    __slots__ = ("_values", "_present", "_parent", "_parent_field",
                 "_active_oneof")

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_present", False)
        object.__setattr__(self, "_parent", None)
        object.__setattr__(self, "_parent_field", None)
        # oneof index -> active field name
        object.__setattr__(self, "_active_oneof", {})
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- presence chain ---------------------------------------------------

    def _mark_present(self) -> None:
        node = self
        while node is not None and not node._present:
            object.__setattr__(node, "_present", True)
            # writing through a oneof submessage selects it, like protobuf
            pf = node._parent_field
            if pf is not None and pf["oneof_index"] is not None:
                parent = node._parent
                active = parent._active_oneof
                prev = active.get(pf["oneof_index"])
                if prev is not None and prev != pf["name"]:
                    parent._values.pop(prev, None)
                active[pf["oneof_index"]] = pf["name"]
            node = node._parent

    # -- attribute surface -------------------------------------------------

    def __getattr__(self, name: str):
        f = type(self)._FIELDS.get(name)
        if f is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        values = self._values
        if name in values:
            return values[name]
        if f["label"] == 3:
            rep = _Repeated(self)
            if f["type"] == "message":
                cls = self._msg_class(f)

                def _add(_rep=rep, _cls=cls, **kw):
                    child = _cls(**kw)
                    _rep.append(child)
                    return child

                rep.add = _add  # type: ignore[method-assign]
            values[name] = rep
            return rep
        if f["type"] == "message":
            child = self._msg_class(f)()
            object.__setattr__(child, "_parent", self)
            object.__setattr__(child, "_parent_field", f)
            values[name] = child
            return child
        return _DEFAULTS[f["type"]]

    def __setattr__(self, name: str, value) -> None:
        f = type(self)._FIELDS.get(name)
        if f is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if f["type"] == "message" and f["label"] != 3:
            if not isinstance(value, MiniMessage):
                raise TypeError(
                    f"{name} expects {f['type_name']}, got {type(value)}"
                )
            object.__setattr__(value, "_parent", self)
            object.__setattr__(value, "_parent_field", f)
            object.__setattr__(value, "_present", False)  # re-climb below
            value._mark_present()
        elif f["label"] == 3:
            rep = _Repeated(self)
            rep.extend(list(value))
            value = rep
        self._values[name] = value
        if f["label"] != 3 and f["type"] != "message":
            self._mark_present()
        if f["oneof_index"] is not None:
            active = self._active_oneof
            prev = active.get(f["oneof_index"])
            if prev is not None and prev != name:
                self._values.pop(prev, None)
            active[f["oneof_index"]] = name
            self._mark_present()

    @classmethod
    def _msg_class(cls, f: dict):
        short = f["type_name"].rsplit(".", 1)[-1]
        return MiniMessage._CLASSES[short]

    # -- wire format -------------------------------------------------------

    def _is_set(self, f: dict) -> bool:
        """Should this field be emitted?"""
        name = f["name"]
        if f["oneof_index"] is not None:
            return self._active_oneof.get(f["oneof_index"]) == name
        v = self._values.get(name)
        if v is None:
            return False
        if f["label"] == 3:
            return len(v) > 0
        if f["type"] == "message":
            return v._present
        return v != _DEFAULTS[f["type"]]

    def SerializeToString(self) -> bytes:  # noqa: N802 (protobuf API)
        out = bytearray()
        for f in sorted(type(self)._FIELDS.values(),
                        key=lambda d: d["number"]):
            if not self._is_set(f):
                continue
            name, num, t = f["name"], f["number"], f["type"]
            v = self._values.get(name)
            if v is None:  # oneof member left at default
                v = _DEFAULTS.get(t)
                if t == "message":
                    v = self._msg_class(f)()
            items = v if f["label"] == 3 else [v]
            for item in items:
                if t in _VARINT_TYPES:
                    out += _tag(num, _WT_VARINT)
                    out += _encode_varint(int(item))
                elif t == "string":
                    b = item.encode("utf-8")
                    out += _tag(num, _WT_LEN) + _encode_varint(len(b)) + b
                elif t == "bytes":
                    b = bytes(item)
                    out += _tag(num, _WT_LEN) + _encode_varint(len(b)) + b
                elif t == "message":
                    b = item.SerializeToString()
                    out += _tag(num, _WT_LEN) + _encode_varint(len(b)) + b
                else:  # pragma: no cover - schema has no other types
                    raise TypeError(f"unsupported field type {t}")
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:  # noqa: N802
        self._values.clear()
        self._active_oneof.clear()
        self._merge(bytes(data))
        object.__setattr__(self, "_present", True)
        return len(data)

    def _merge(self, buf: bytes) -> None:
        by_num = type(self)._BY_NUMBER
        i = 0
        n = len(buf)
        while i < n:
            key, i = _decode_varint(buf, i)
            num, wt = key >> 3, key & 7
            f = by_num.get(num)
            if wt == _WT_VARINT:
                val, i = _decode_varint(buf, i)
                if f is None:
                    continue
                t = f["type"]
                if t in ("int32", "int64") and val >= 1 << 63:
                    val -= 1 << 64  # negative two's-complement varint
                if t == "bool":
                    val = bool(val)
                self._store(f, val)
            elif wt == _WT_LEN:
                ln, i = _decode_varint(buf, i)
                chunk = buf[i : i + ln]
                i += ln
                if f is None:
                    continue
                t = f["type"]
                if t == "string":
                    self._store(f, chunk.decode("utf-8"))
                elif t == "bytes":
                    self._store(f, bytes(chunk))
                elif t == "message":
                    child = self._msg_class(f)()
                    child._merge(chunk)
                    object.__setattr__(child, "_present", True)
                    if f["label"] == 3:
                        getattr(self, f["name"]).append(child)
                    else:
                        object.__setattr__(child, "_parent", self)
                        self._values[f["name"]] = child
                        if f["oneof_index"] is not None:
                            self._active_oneof[f["oneof_index"]] = f["name"]
                elif t in _VARINT_TYPES:  # packed repeated varints
                    j = 0
                    while j < len(chunk):
                        val, j = _decode_varint(chunk, j)
                        self._store(f, val)
                else:  # pragma: no cover
                    continue
            elif wt == 5:
                i += 4  # unknown fixed32: skip
            elif wt == 1:
                i += 8  # unknown fixed64: skip
            else:
                raise ValueError(f"unsupported wire type {wt}")

    def _store(self, f: dict, val) -> None:
        if f["label"] == 3:
            getattr(self, f["name"]).append(val)
        else:
            self._values[f["name"]] = val
            if f["oneof_index"] is not None:
                self._active_oneof[f["oneof_index"]] = f["name"]

    # -- conveniences mirroring the protobuf API --------------------------

    def HasField(self, name: str) -> bool:  # noqa: N802
        f = type(self)._FIELDS.get(name)
        if f is None:
            raise ValueError(f"no field {name!r}")
        return self._is_set(f)

    def __repr__(self) -> str:
        parts = ", ".join(
            f"{k}={v!r}" for k, v in self._values.items()
        )
        return f"{type(self).__name__}({parts})"

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.SerializeToString() == other.SerializeToString()
        )


def _build_classes() -> dict:
    classes = MiniMessage._CLASSES
    if classes:
        return classes
    for full, spec in MESSAGES.items():
        short = full[len(PACKAGE) + 1 :] if full.startswith(PACKAGE) else full
        fields = {f["name"]: f for f in spec["fields"]}
        cls = type(
            short,
            (MiniMessage,),
            {
                "_FIELDS": fields,
                "_BY_NUMBER": {f["number"]: f for f in spec["fields"]},
                "_ONEOFS": spec["oneofs"],
                "__slots__": (),
            },
        )
        classes[short] = cls
    return classes


def build_module() -> _types.ModuleType:
    """A module with the generated-pb2 surface: message classes + enums."""
    mod = _types.ModuleType("cellbase_statemessage_shim")
    mod.__doc__ = (
        "Pure-Python stand-in for pyspark's StateMessage_pb2 "
        "(cellbase_spark.streaming.pbshim)"
    )
    for short, cls in _build_classes().items():
        setattr(mod, short, cls)
    for values in ENUMS.values():
        for vname, vnum in values.items():
            setattr(mod, vname, vnum)
    return mod


_PB2_NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"


def install() -> bool:
    """Install the shim as StateMessage_pb2 iff google.protobuf is absent.

    Returns True when the shim is (now) active. Idempotent; safe to call
    in both the driver and the Python worker (the pickled processor's
    module import triggers it worker-side before any state call)."""
    try:
        # `import google.protobuf` alone can succeed as an EMPTY namespace
        # package (observed in this container's Spark driver worker); probe
        # for the symbol the generated pb2 actually needs.
        from google.protobuf import descriptor  # noqa: F401

        return False  # real runtime available: use it
    except ImportError:
        pass
    existing = sys.modules.get(_PB2_NAME)
    if existing is not None and getattr(existing, "__doc__", "").startswith(
        "Pure-Python stand-in"
    ):
        return True
    mod = build_module()
    sys.modules[_PB2_NAME] = mod
    try:  # keep `from pyspark.sql.streaming.proto import StateMessage_pb2` working
        import pyspark.sql.streaming.proto as proto_pkg

        proto_pkg.StateMessage_pb2 = mod
    except Exception:
        pass
    return True
