"""Spark-free hardware-scaling control for the sandbox VM.

Runs the raster pipeline's actual per-partition kernel (generate ->
decode -> PSNR gate -> chip sums, sources.images + operators.raster
numpy code) under plain multiprocessing at two worker counts — no JVM,
no Arrow, no shuffle. The resulting efficiency is the CEILING the
hardware itself allows for this workload class at that span; engine
numbers in BENCH.md are read against it.

Usage: python tools/hw_control.py [--rows 200000] [--levels 8,32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, ".")


def _work_chunk(args: tuple[int, int]) -> int:
    start, count = args
    import numpy as np

    from spatial4n_spark.operators.raster import _psnr_batch, _reference_pixels_batch
    from spatial4n_spark.sources.images import _gen_batch, decode_image_batch

    batch = _gen_batch(np.arange(start, start + count, dtype=np.int64), True)
    w = batch.column("w").to_numpy()
    h = batch.column("h").to_numpy()
    ids = batch.column("image_id").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    decoded = decode_image_batch(batch.column("bytes").to_pylist(), w, h, fmts)
    n_ok = 0
    sizes = np.stack([w, h], axis=1)
    for wh in np.unique(sizes, axis=0):
        sel = np.where((w == wh[0]) & (h == wh[1]))[0]
        imgs = np.stack([decoded[k] for k in sel])
        refs = _reference_pixels_batch([ids[k] for k in sel], int(wh[0]), int(wh[1]))
        n_ok += int((_psnr_batch(imgs, refs) >= 40.0).sum())
    return n_ok


def run_level(workers: int, rows: int, chunk: int = 4000, reps: int = 3) -> dict:
    if reps < 1:
        raise ValueError("reps must be >= 1")
    chunks = [(s, min(chunk, rows - s)) for s in range(0, rows, chunk)]
    best = None
    total = 0
    with mp.Pool(workers) as pool:
        pool.map(_work_chunk, chunks[:2])  # warm the pool
        for _ in range(reps):
            t0 = time.time()
            total = sum(pool.map(_work_chunk, chunks))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
    return {"workers": workers, "rows": rows, "sec": round(best, 3),
            "rows_per_sec": round(rows / best, 1), "ok": total}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--levels", type=str, default="8,32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    results = [run_level(w, args.rows, reps=args.reps) for w in levels]
    lo, hi = results[0], results[-1]
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (hi["workers"] / lo["workers"])
    print(json.dumps({"control": "spark-free multiprocessing, same numpy kernel",
                      "levels": results, "hw_ceiling_efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
