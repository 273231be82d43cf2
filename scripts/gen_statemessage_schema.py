"""Generate the StateMessage schema table for the protobuf-free TWS shim.

pyspark's generated ``pyspark/sql/streaming/proto/StateMessage_pb2.py``
embeds the serialized ``FileDescriptorProto`` for StateMessage.proto and
hands it to the google.protobuf runtime (absent in this container) to
build message classes at import time. This script decodes that embedded
descriptor with a ~100-line hand-written wire-format reader — the
FileDescriptorProto schema is public knowledge (descriptor.proto) — and
writes ``cellbase_spark/streaming/_statemessage_schema.py``: a plain
dict literal of messages/fields/enums that the pure-Python mini runtime
(cellbase_spark/streaming/pbshim.py) turns back into message classes.

Re-run after a pyspark upgrade:  python scripts/gen_statemessage_schema.py
"""

from __future__ import annotations

import ast
import pprint
import re
import sys
from pathlib import Path

# ---- minimal wire-format reader ------------------------------------------


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields_of(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i = 0
    while i < len(buf):
        tag, i = read_varint(buf, i)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = read_varint(buf, i)
        elif wt == 2:
            ln, i = read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:
            val = buf[i : i + 4]
            i += 4
        elif wt == 1:
            val = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield num, wt, val


# ---- descriptor.proto (public) field numbers ------------------------------
# FileDescriptorProto:   1 name, 2 package, 4 message_type, 5 enum_type
# DescriptorProto:       1 name, 2 field, 3 nested_type, 4 enum_type,
#                        8 oneof_decl (OneofDescriptorProto: 1 name)
# FieldDescriptorProto:  1 name, 3 number, 4 label, 5 type, 6 type_name,
#                        9 oneof_index, 17 proto3_optional
# EnumDescriptorProto:   1 name, 2 value (EnumValueDescriptorProto: 1 name,
#                        2 number)

TYPE_NAMES = {
    1: "double", 2: "float", 3: "int64", 4: "uint64", 5: "int32",
    6: "fixed64", 7: "fixed32", 8: "bool", 9: "string", 11: "message",
    12: "bytes", 13: "uint32", 14: "enum", 15: "sfixed32", 16: "sfixed64",
    17: "sint32", 18: "sint64",
}


def parse_enum(buf: bytes) -> dict:
    name = None
    values = {}
    for num, _wt, val in fields_of(buf):
        if num == 1:
            name = val.decode()
        elif num == 2:
            vname, vnum = None, 0
            for n2, _w2, v2 in fields_of(val):
                if n2 == 1:
                    vname = v2.decode()
                elif n2 == 2:
                    vnum = v2
            values[vname] = vnum
    return {"name": name, "values": values}


def parse_field(buf: bytes) -> dict:
    f = {"name": None, "number": None, "label": 1, "type": None,
         "type_name": None, "oneof_index": None, "proto3_optional": False}
    for num, _wt, val in fields_of(buf):
        if num == 1:
            f["name"] = val.decode()
        elif num == 3:
            f["number"] = val
        elif num == 4:
            f["label"] = val  # 1 optional, 3 repeated
        elif num == 5:
            f["type"] = TYPE_NAMES[val]
        elif num == 6:
            f["type_name"] = val.decode().lstrip(".")
        elif num == 9:
            f["oneof_index"] = val
        elif num == 17:
            f["proto3_optional"] = bool(val)
    return f


def parse_message(buf: bytes, prefix: str, out: dict, enums: dict) -> None:
    name = None
    fields = []
    oneofs = []
    nested = []
    nested_enums = []
    for num, _wt, val in fields_of(buf):
        if num == 1:
            name = val.decode()
        elif num == 2:
            fields.append(parse_field(val))
        elif num == 3:
            nested.append(val)
        elif num == 4:
            nested_enums.append(val)
        elif num == 8:
            oname = None
            for n2, _w2, v2 in fields_of(val):
                if n2 == 1:
                    oname = v2.decode()
            oneofs.append(oname)
    full = f"{prefix}.{name}" if prefix else name
    out[full] = {"fields": fields, "oneofs": oneofs}
    for e in nested_enums:
        pe = parse_enum(e)
        enums[f"{full}.{pe['name']}"] = pe["values"]
    for nb in nested:
        parse_message(nb, full, out, enums)


def main() -> None:
    import pyspark.sql.streaming.proto as proto_pkg

    pb2_path = Path(proto_pkg.__file__).parent / "StateMessage_pb2.py"
    src = pb2_path.read_text()
    m = re.search(r"AddSerializedFile\(\s*(b(?:'''|\"\"\"|'|\").*?)\n?\)",
                  src, re.DOTALL)
    if not m:
        sys.exit("could not locate AddSerializedFile blob in " + str(pb2_path))
    blob = ast.literal_eval(m.group(1).strip().rstrip(","))

    package = ""
    messages: dict = {}
    enums: dict = {}
    for num, _wt, val in fields_of(blob):
        if num == 2:
            package = val.decode()
        elif num == 4:
            parse_message(val, package, messages, enums)
        elif num == 5:
            pe = parse_enum(val)
            enums[f"{package}.{pe['name']}" if package else pe["name"]] = (
                pe["values"]
            )

    out_path = (
        Path(__file__).resolve().parent.parent
        / "cellbase_spark" / "streaming" / "_statemessage_schema.py"
    )
    with open(out_path, "w") as f:
        f.write(
            '"""StateMessage.proto schema table — GENERATED by\n'
            "scripts/gen_statemessage_schema.py from the FileDescriptorProto\n"
            "embedded in the installed pyspark's StateMessage_pb2.py.\n"
            'Do not edit; re-run the script after a pyspark upgrade."""\n\n'
        )
        f.write(f"PACKAGE = {package!r}\n\n")
        f.write("MESSAGES = ")
        f.write(pprint.pformat(messages, width=79, sort_dicts=False))
        f.write("\n\nENUMS = ")
        f.write(pprint.pformat(enums, width=79, sort_dicts=False))
        f.write("\n")
    n_fields = sum(len(v["fields"]) for v in messages.values())
    print(f"wrote {out_path}: {len(messages)} messages, {n_fields} fields, "
          f"{len(enums)} enums")


if __name__ == "__main__":
    main()
