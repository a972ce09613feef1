#!/usr/bin/env python3
"""Fixture pin recipe for graft.operators.ArrowIpc (C229).

Writes Arrow IPC (Feather v2) fixtures with pyarrow — THE reference
implementation — into src/test/resources/arrow/, and prints the
facts (field names/types, batch/dictionary counts, total rows) that
ArrowSpec hardcodes. Driver-side tool: pyarrow 16.1.0 here.

Usage: python3 tools/arrow_pin.py
"""
import json
import os

import pyarrow as pa
import pyarrow.ipc as ipc

OUT = "src/main/resources/arrow/"


def write(name, batches, schema, options=None):
    path = OUT + name
    with pa.OSFile(path, "wb") as f:
        with ipc.new_file(f, schema, options=options) as w:
            for b in batches:
                w.write_batch(b)
    with pa.memory_map(path) as src:
        r = ipc.open_file(src)
        rows = sum(r.get_batch(i).num_rows
                   for i in range(r.num_record_batches))
        return dict(file=name, names=r.schema.names,
                    types=[str(t) for t in r.schema.types],
                    n_batches=r.num_record_batches, rows=rows,
                    size=os.path.getsize(path))


def main():
    os.makedirs(OUT, exist_ok=True)
    out = []

    s0 = pa.schema([("id", pa.int64()), ("name", pa.utf8())])
    b0a = pa.record_batch([pa.array(range(60), pa.int64()),
                           pa.array([f"n{i}" for i in range(60)])],
                          schema=s0)
    b0b = pa.record_batch([pa.array(range(40), pa.int64()),
                           pa.array([f"m{i}" for i in range(40)])],
                          schema=s0)
    out.append(write("fx0.arrow", [b0a, b0b], s0))

    s1 = pa.schema([("v", pa.float64()), ("ok", pa.bool_()),
                    ("ts", pa.timestamp("us")),
                    ("u", pa.uint32())])
    b1 = pa.record_batch([
        pa.array([i * 0.5 for i in range(25)]),
        pa.array([i % 2 == 0 for i in range(25)]),
        pa.array(range(25), pa.timestamp("us")),
        pa.array(range(25), pa.uint32())], schema=s1)
    out.append(write("fx1.arrow", [b1], s1))

    s2 = pa.schema([("xs", pa.list_(pa.int32())),
                    ("st", pa.struct([("a", pa.int16()),
                                      ("b", pa.utf8())]))])
    b2 = pa.record_batch([
        pa.array([[1, 2], [3], []] * 10, pa.list_(pa.int32())),
        pa.array([{"a": 1, "b": "x"}] * 30,
                 pa.struct([("a", pa.int16()), ("b", pa.utf8())]))],
        schema=s2)
    out.append(write("fx2.arrow", [b2], s2))

    s3 = pa.schema([("cat", pa.dictionary(pa.int8(), pa.utf8())),
                    ("n", pa.int32())])
    b3 = pa.record_batch([
        pa.array(["x", "y", "x", "z"] * 5).dictionary_encode(),
        pa.array(range(20), pa.int32())], schema=s3)
    out.append(write("fx3.arrow", [b3], s3))

    s4 = pa.schema([("payload", pa.binary()), ("k", pa.int64())])
    b4 = pa.record_batch([
        pa.array([b"blob" * 100] * 50, pa.binary()),
        pa.array(range(50), pa.int64())], schema=s4)
    opts = ipc.IpcWriteOptions(compression="zstd")
    out.append(write("fx4.arrow", [b4, b4, b4], s4, options=opts))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
