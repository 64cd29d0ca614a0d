#!/usr/bin/env python3
"""Reshard a single-file-per-table sf dir into the production layout:
each table becomes a DIRECTORY of part files (same rows, same physical
types). Used to prove the whole gate set runs over multi-file tables:

    python3 scripts/reshard.py /root/testdata/sf0.01 /tmp/graft-resharded 4
    sbt -batch "runMain graft.Verify /tmp/graft-resharded /tmp/verify_reshard"
    python3 scripts/check_oracle.py /tmp/graft-resharded /tmp/verify_reshard
"""
import math
import os
import sys

import pyarrow.parquet as pq


def main(src, dst, nparts=4):
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(f"{src}/{f}")
        d = f"{dst}/{f}"
        os.makedirs(d, exist_ok=True)
        step = math.ceil(len(t) / nparts) or 1
        written = 0
        for i in range(nparts):
            chunk = t.slice(i * step, step)
            if len(chunk):
                pq.write_table(chunk, f"{d}/part-{i:04d}.parquet")
                written += 1
        print(f"{f}: {len(t)} rows -> {written} part files")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 4)
