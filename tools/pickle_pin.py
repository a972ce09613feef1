#!/usr/bin/env python3
"""Fixture pin recipe for graft.operators.Pickle (C227).

Writes pickle fixtures with CPython's own pickle module — THE
reference implementation — at every protocol 0..5, plus a
global/REDUCE case and a memo-reuse case, into
src/test/resources/pickle/. Prints the facts (protocol, opcode
count, top-level kind, container length, globals, memo puts) that
PickleSpec hardcodes. Driver-side tool: CPython 3.x on this machine.

Usage: python3 tools/pickle_pin.py
"""
import io
import json
import os
import pickle
import pickletools

OUT = "src/test/resources/pickle/"

CANON = {
    "a": [1, 2.5, True, None],
    "b": ("x", b"bytes"),
    "c": {"nested": 7},
}


def facts(name, blob, top):
    ops = list(pickletools.genops(blob))
    names = [op.name for op, arg, pos in ops]
    n_memo = sum(1 for n in names
                 if n in ("PUT", "BINPUT", "LONG_BINPUT", "MEMOIZE"))
    n_frames = names.count("FRAME")
    globs = set()
    it = iter(ops)
    prev = []
    for op, arg, pos in ops:
        if op.name in ("GLOBAL", "INST"):
            globs.add(arg.replace(" ", "."))
        if op.name == "STACK_GLOBAL":
            # the two preceding string pushes
            globs.add(f"{prev[-2][1]}.{prev[-1][1]}")
        prev.append((op.name, arg))
    kind = type(top).__name__
    n_items = len(top) if isinstance(top, (dict, list, tuple,
                                           set, frozenset)) else None
    return dict(file=name, protocol=pickle.loads(blob) is not None
                and proto_of(blob), n_ops=len(ops), top_kind=kind,
                n_items=n_items, globals=sorted(globs),
                n_memo=n_memo, n_frames=n_frames, size=len(blob))


def proto_of(blob):
    return blob[1] if blob[:1] == b"\x80" else 0


def main():
    os.makedirs(OUT, exist_ok=True)
    out = []
    for p in range(6):
        blob = pickle.dumps(CANON, protocol=p)
        with open(OUT + f"fx{p}.pkl", "wb") as f:
            f.write(blob)
        out.append(facts(f"fx{p}.pkl", blob, CANON))
    import collections
    od = collections.OrderedDict([("k", 1), ("j", 2)])
    blob = pickle.dumps(od, protocol=4)
    with open(OUT + "fx6.pkl", "wb") as f:
        f.write(blob)
    out.append(facts("fx6.pkl", blob, od))
    shared = [1, 2]
    memo = [shared, shared, {"s": shared}]
    blob = pickle.dumps(memo, protocol=2)
    with open(OUT + "fx7.pkl", "wb") as f:
        f.write(blob)
    out.append(facts("fx7.pkl", blob, memo))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
