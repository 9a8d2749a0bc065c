"""Raster <-> vector stage: batched image decode, PSNR/caption gates,
cell-aligned chipping, per-cell mosaic aggregation (SURVEY.md §2.9).

Everything runs through ``mapInArrow`` — whole Arrow batches in, numpy
per-image kernels inside, Arrow batches out; no per-row Python UDF calls
(BASELINE.json input_hint). Per-batch memory is bounded by chunking
(SURVEY.md §4.2 spill-aware requirement): decode never materializes more
than ``chunk_rows`` images at once.

Correctness gates (input_hint):
- decoded-pixel invariant: PSNR vs the reference pixels >= 40 dB for the
  lossy format, exact (inf dB, reported as 999) for lossless formats;
- caption equality: byte-exact against the expected caption.

The reference pixels come from the deterministic source generator
(sources.images) — the stand-in for a reference decoder at design scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from spatial4n_spark.kernels.geohash import geohash_encode_str
from spatial4n_spark.sources.images import decode_image_batch

PSNR_CAP_DB = 999.0  # reported PSNR for exact (mse=0) reconstructions


def _psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return PSNR_CAP_DB
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def _reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Reference decode for the PSNR gate (deterministic source pixels)."""
    from spatial4n_spark.sources.images import _mix64

    i = int(image_id[3:])
    npix = w * h * 3
    pix = _mix64(np.arange(npix, dtype=np.uint64) + np.uint64(i) * np.uint64(0x1F123))
    return (pix & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


DECODE_CHECK_SCHEMA = (
    "image_id string, fmt string, cell string, psnr_db double, "
    "caption_ok boolean, mean_px double"
)


def decode_check(images: DataFrame, level: int = 4, chunk_rows: int = 2048) -> DataFrame:
    """Decode every image, verify PSNR + caption invariants, assign a cell.

    Returns one row per image with the gate results — the validation stage
    of the raster pipeline (run it on samples at design scale).
    """

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                chunk = batch.slice(s, chunk_rows)
                ids = chunk.column("image_id").to_pylist()
                bufs = chunk.column("bytes").to_pylist()
                w = chunk.column("w").to_numpy()
                h = chunk.column("h").to_numpy()
                fmts = chunk.column("fmt").to_pylist()
                caps = chunk.column("caption").to_pylist()
                lon = chunk.column("lon").to_numpy()
                lat = chunk.column("lat").to_numpy()

                decoded = decode_image_batch(bufs, w, h, fmts)
                cells = geohash_encode_str(lat, lon, level)
                psnr = np.empty(len(ids), dtype=np.float64)
                cap_ok = np.empty(len(ids), dtype=bool)
                mean_px = np.empty(len(ids), dtype=np.float64)
                for k, (iid, img) in enumerate(zip(ids, decoded)):
                    ref = _reference_pixels(iid, int(w[k]), int(h[k]))
                    psnr[k] = _psnr_db(img, ref)
                    mean_px[k] = float(img.mean())
                    expect = f"caption for img{int(iid[3:])} at {lat[k]:.4f},{lon[k]:.4f}"
                    cap_ok[k] = caps[k] == expect
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids, pa.string()),
                        pa.array(fmts, pa.string()),
                        pa.array(cells, pa.string()),
                        pa.array(psnr, pa.float64()),
                        pa.array(cap_ok, pa.bool_()),
                        pa.array(mean_px, pa.float64()),
                    ],
                    names=["image_id", "fmt", "cell", "psnr_db", "caption_ok", "mean_px"],
                )

    return images.mapInArrow(run, DECODE_CHECK_SCHEMA)


CHIPS_SCHEMA = (
    "image_id string, cell string, chip_row int, chip_col int, "
    "chip_w int, chip_h int, chip_mean double, chip binary"
)


def tile_images(
    images: DataFrame,
    level: int = 4,
    chip_px: int = 8,
    with_chip_bytes: bool = False,
    chunk_rows: int = 1024,
    min_psnr_db: float | None = None,
) -> DataFrame:
    """Chip each decoded image into ``chip_px`` x ``chip_px`` raster chips,
    each tagged with the image's cell — the raster->vector tiling stage.

    Chip payload bytes are optional (with_chip_bytes): the aggregate-only
    path never moves pixel data through the shuffle, which is the plan you
    want at 10^12 images (chips are written columnar per cell instead).

    ``min_psnr_db`` fuses the decode gate (PSNR + caption) into this same
    pass: each image is decoded once and gated before chipping — no
    second decode, no per-image join against a gate table (which would be
    a 10^12-row join at design scale).
    """

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                chunk = batch.slice(s, chunk_rows)
                ids = chunk.column("image_id").to_pylist()
                bufs = chunk.column("bytes").to_pylist()
                w = chunk.column("w").to_numpy()
                h = chunk.column("h").to_numpy()
                fmts = chunk.column("fmt").to_pylist()
                caps = chunk.column("caption").to_pylist()
                lon = chunk.column("lon").to_numpy()
                lat = chunk.column("lat").to_numpy()

                decoded = decode_image_batch(bufs, w, h, fmts)
                cells = geohash_encode_str(lat, lon, level)

                out_id, out_cell, out_r, out_c = [], [], [], []
                out_w, out_h, out_mean, out_bytes = [], [], [], []
                for k, (iid, cell, img) in enumerate(zip(ids, cells, decoded)):
                    if min_psnr_db is not None:
                        ref = _reference_pixels(iid, int(w[k]), int(h[k]))
                        expect = f"caption for img{int(iid[3:])} at {lat[k]:.4f},{lon[k]:.4f}"
                        if _psnr_db(img, ref) < min_psnr_db or caps[k] != expect:
                            continue
                    hh, ww = img.shape[0], img.shape[1]
                    for r0 in range(0, hh, chip_px):
                        for c0 in range(0, ww, chip_px):
                            chip = img[r0 : r0 + chip_px, c0 : c0 + chip_px]
                            out_id.append(iid)
                            out_cell.append(cell)
                            out_r.append(r0 // chip_px)
                            out_c.append(c0 // chip_px)
                            out_w.append(chip.shape[1])
                            out_h.append(chip.shape[0])
                            out_mean.append(float(chip.mean()))
                            out_bytes.append(chip.tobytes() if with_chip_bytes else b"")
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_id, pa.string()),
                        pa.array(out_cell, pa.string()),
                        pa.array(out_r, pa.int32()),
                        pa.array(out_c, pa.int32()),
                        pa.array(out_w, pa.int32()),
                        pa.array(out_h, pa.int32()),
                        pa.array(out_mean, pa.float64()),
                        pa.array(out_bytes, pa.binary()),
                    ],
                    names=[
                        "image_id", "cell", "chip_row", "chip_col",
                        "chip_w", "chip_h", "chip_mean", "chip",
                    ],
                )

    return images.mapInArrow(run, CHIPS_SCHEMA)


def cell_mosaic_stats(chips: DataFrame) -> DataFrame:
    """Per-cell chip aggregation (the vector side of raster tiling).

    Map-side partial aggregation handles the hot-cell skew here (counts
    and sums are decomposable); at extreme skew use tiles.tile_stats-style
    explicit salting upstream.

    n_images avoids countDistinct (which would expand the shuffle to one
    row per (cell, image) — the scaling bottleneck at 10^12 images): an
    image's chips all carry its single cell, so distinct images per cell
    == chips at grid position (0, 0).
    """
    from pyspark.sql import functions as F

    return chips.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_chips"),
        F.sum(
            ((F.col("chip_row") == 0) & (F.col("chip_col") == 0)).cast("long")
        ).alias("n_images"),
        F.sum(F.col("chip_w") * F.col("chip_h")).alias("sum_px"),
        F.avg("chip_mean").alias("avg_brightness"),
    )


def raster_pipeline(
    images: DataFrame, level: int = 4, chip_px: int = 8, min_psnr_db: float = 40.0
) -> DataFrame:
    """decode -> PSNR/caption gate -> chip -> per-cell mosaic stats.

    One fused decode pass (gate inside tile_images), then a per-cell
    aggregation whose only shuffle carries small partial aggregates —
    images failing the gate are excluded at the source (at design scale
    they'd be routed to a quarantine table instead of dropped).
    """
    chips = tile_images(images, level, chip_px, min_psnr_db=min_psnr_db)
    return cell_mosaic_stats(chips)
