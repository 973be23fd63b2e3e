#!/usr/bin/env python
"""Rerun the REFERENCE implementation on the engine's bench data.

Dumps embeddings (+ the bench's fixed query set) from
$SPARK_GRAFT_SF_DIR to a flat binary, compiles tools/ref_bench.cpp
against the read-only reference header (-I /root/reference), runs it
with the same params bench.py uses, and prints the reference's JSON —
the apples-to-apples baseline for BASELINE.md's "within 2x" target.

Everything builds/writes under /tmp; the reference tree is untouched.
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import sys

import duckdb
import numpy as np

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
R, L, ALPHA, EF, K = 32, 64, 1.2, 100, 10


def main() -> None:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    P = np.array([r[1] for r in rows], dtype=np.float32)
    qmask = ids % 25 == 0
    Q = P[qmask]
    n, dim = P.shape
    nq = Q.shape[0]

    data = "/tmp/ref_bench_data.bin"
    with open(data, "wb") as f:
        f.write(struct.pack("<III", n, dim, nq))
        f.write(P.astype("<f4").tobytes())
        f.write(Q.astype("<f4").tobytes())

    exe = "/tmp/ref_bench"
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_bench.cpp")
    subprocess.run(
        ["g++", "-O3", "-fopenmp", "-std=c++14", "-I/root/reference", src, "-o", exe],
        check=True,
    )
    out = subprocess.run(
        [exe, data, str(R), str(L), str(ALPHA), str(EF), str(K)],
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()
    # the reference prints a status line ("grpah init success") before our JSON
    ref = json.loads(out.splitlines()[-1])
    ref["sf_dir"] = SF_DIR
    ref["params"] = {"R": R, "L": L, "alpha": ALPHA, "ef_search": EF, "k": K}
    print(json.dumps(ref))


if __name__ == "__main__":
    main()
