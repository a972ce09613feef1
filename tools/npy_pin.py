#!/usr/bin/env python3
"""Fixture pin recipe for graft.operators.Npy (C226).

Writes .npy/.npz fixtures with numpy — THE reference writer — into
src/test/resources/npy/, and prints the facts (version, descr,
fortran, shape, itemsize, data CRC32, exact integer sum) that
NpySpec hardcodes. Driver-side tool: numpy 1.26.4 on this machine.

Usage: python3 tools/npy_pin.py
"""
import io
import json
import zlib
import numpy as np

OUT = "src/test/resources/npy/"


def facts(path):
    with open(path, "rb") as f:
        b = f.read()
    assert b[:6] == b"\x93NUMPY"
    major, minor = b[6], b[7]
    if major == 1:
        hlen = int.from_bytes(b[8:10], "little")
        data_at = 10 + hlen
    else:
        hlen = int.from_bytes(b[8:12], "little")
        data_at = 12 + hlen
    header = b[data_at - hlen:data_at].decode("latin-1")
    crc = zlib.crc32(b[data_at:]) & 0xFFFFFFFF
    a = np.load(path, allow_pickle=False)
    int_sum = None
    if a.dtype.kind in "biu":
        int_sum = int(a.sum(dtype=np.int64)) if a.size else 0
    return dict(
        file=path.split("/")[-1], version=f"{major}.{minor}",
        descr=str(a.dtype.str if a.dtype.names is None else "struct"),
        fortran=bool(np.isfortran(a)) if a.ndim > 1 else False,
        shape=list(a.shape), itemsize=a.dtype.itemsize,
        n_elems=int(a.size), data_len=len(b) - data_at,
        data_crc32=crc, int_sum=int_sum,
        header=header.strip())


def write(name, arr, version=None):
    path = OUT + name
    if version is None:
        np.save(path[:-4], arr, allow_pickle=False)
    else:
        with open(path, "wb") as f:
            np.lib.format.write_array(f, arr, version=version)
    return facts(path)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    out = []
    out.append(write("fx0.npy", np.arange(100, dtype="<i8")))
    out.append(write("fx1.npy",
                     (np.arange(30, dtype="<f8") * 0.5).reshape(10, 3)))
    out.append(write("fx2.npy", (np.arange(50) % 3 == 0)))
    out.append(write("fx3.npy", (np.arange(7) * 3).astype(">i4"),
                     version=(2, 0)))
    out.append(write("fx4.npy",
                     np.asfortranarray(
                         np.arange(42, dtype="<i4").reshape(6, 7))))
    out.append(write("fx5.npy", np.float64(2.5)))
    out.append(write("fx6.npy",
                     np.array(["alpha", "beta", "gamma"], dtype="<U5")))
    out.append(write("fx7.npy",
                     np.array([(1, 2.5), (3, 4.5)],
                              dtype=[("a", "<i4"), ("x", "<f8")])))
    np.savez(OUT + "fx8.npz",
             ints=np.arange(12, dtype="<i8"),
             mat=np.ones((3, 4), dtype="<f4"),
             flags=np.array([True, False, True]))
    np.savez_compressed(OUT + "fx9.npz",
                        big=np.zeros(1000, dtype="<i2"),
                        name=np.array(["x"], dtype="<U1"))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
