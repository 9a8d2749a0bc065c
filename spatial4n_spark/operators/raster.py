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


def _reference_pixels_batch(ids: list[str], w: int, h: int) -> np.ndarray:
    """Vectorized reference pixels for k same-size images -> (k, h, w, 3)."""
    from spatial4n_spark.sources.images import _mix64

    nums = np.array([int(s[3:]) for s in ids], dtype=np.uint64)
    npix = w * h * 3
    idx = nums[:, None] * np.uint64(0x1F123) + np.arange(npix, dtype=np.uint64)[None, :]
    pix = _mix64(idx)
    return (pix & np.uint64(0xFF)).astype(np.uint8).reshape(len(ids), h, w, 3)


def _psnr_batch(imgs: np.ndarray, refs: np.ndarray) -> np.ndarray:
    """(k,h,w,3) x2 -> per-image PSNR dB. Integer error sums are exact in
    float64, so this equals the scalar path bit-for-bit."""
    err = imgs.astype(np.float64) - refs.astype(np.float64)
    mse = np.mean(err * err, axis=(1, 2, 3))
    out = np.full(len(imgs), PSNR_CAP_DB)
    nz = mse > 0.0
    out[nz] = 10.0 * np.log10(255.0 * 255.0 / mse[nz])
    return out


DECODE_CHECK_SCHEMA = (
    "image_id string, fmt string, cell string, psnr_db double, "
    "caption_ok boolean, mean_px double"
)


def _check_chunk(chunk: pa.RecordBatch, level: int) -> pa.RecordBatch:
    """Decode + PSNR/caption gate of one Arrow chunk -> result batch."""
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
    mean_px = np.empty(len(ids), dtype=np.float64)
    # vectorize per size group: stacked (k,h,w,3) reference
    # regen + PSNR — integer sums keep it bit-equal to the
    # per-image path while amortizing per-image Python cost
    sizes = np.stack([w, h], axis=1)
    for wh in np.unique(sizes, axis=0):
        sel = np.where((w == wh[0]) & (h == wh[1]))[0]
        imgs = np.stack([decoded[k] for k in sel])
        refs = _reference_pixels_batch(
            [ids[k] for k in sel], int(wh[0]), int(wh[1])
        )
        psnr[sel] = _psnr_batch(imgs, refs)
        mean_px[sel] = imgs.astype(np.float64).mean(axis=(1, 2, 3))
    cap_ok = np.array(
        [
            caps[k] == f"caption for img{int(ids[k][3:])} at {lat[k]:.4f},{lon[k]:.4f}"
            for k in range(len(ids))
        ],
        dtype=bool,
    )
    return pa.RecordBatch.from_arrays(
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


def decode_check(images: DataFrame, level: int = 4, chunk_rows: int = 4096) -> DataFrame:
    """Decode every image, verify PSNR + caption invariants, assign a cell.

    Returns one row per image with the gate results — the validation stage
    of the raster pipeline (run it on samples at design scale).
    """

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                yield _check_chunk(batch.slice(s, chunk_rows), level)

    return images.mapInArrow(run, DECODE_CHECK_SCHEMA)


def generate_decode_check(
    spark,
    n_rows: int,
    level: int = 4,
    partitions: int | None = None,
    chunk_rows: int = 2048,
) -> DataFrame:
    """Fused source -> decode -> gate: ONE Python stage over spark.range.

    The separate-source form (images_df |> decode_check) ships every image
    payload Python -> JVM -> Python; a production scan -> decode pipeline
    crosses the Arrow boundary once, and this fused stand-in matches it —
    bytes are generated, decoded, and gated inside the same worker, and
    only the per-image summary leaves the stage."""
    from spatial4n_spark.sources.images import _gen_batch

    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(0).to_numpy()
            for s in range(0, len(ids), chunk_rows):
                yield _check_chunk(_gen_batch(ids[s : s + chunk_rows], True), level)

    return rng.mapInArrow(run, DECODE_CHECK_SCHEMA)


CHIPS_SCHEMA = (
    "image_id string, cell string, chip_row int, chip_col int, "
    "chip_w int, chip_h int, chip_sum long, chip_mean double, chip binary"
)
# s2/h3 backends: int64 cells instead of geohash strings
CHIPS_SCHEMA_S2 = CHIPS_SCHEMA.replace("cell string", "cell long")


def _chips_schema(index: str) -> str:
    return CHIPS_SCHEMA if index == "geohash" else CHIPS_SCHEMA_S2


def tile_images(
    images: DataFrame,
    level: int = 4,
    chip_px: int = 8,
    with_chip_bytes: bool = False,
    chunk_rows: int = 4096,
    min_psnr_db: float | None = None,
    index: str = "geohash",
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
                yield _tile_chunk(
                    batch.slice(s, chunk_rows), level, chip_px, with_chip_bytes,
                    min_psnr_db, index,
                )

    return images.mapInArrow(run, _chips_schema(index))


def _tile_chunk(
    chunk: pa.RecordBatch,
    level: int,
    chip_px: int,
    with_chip_bytes: bool,
    min_psnr_db: float | None,
    index: str = "geohash",
) -> pa.RecordBatch:
    """Decode + optional gate + chip of one Arrow chunk -> chips batch.

    Column construction never boxes per-chip Python objects: repeated
    string columns (image_id, geohash cell) come from Arrow ``take`` on
    the per-IMAGE array, numeric columns are numpy arrays handed to
    Arrow zero-copy — at 16 chips/image the chip batch is 16x the image
    batch, so list-of-PyObject assembly here was the stage's hidden
    serial cost (measured ~5x on the construction step)."""
    ids_arr = chunk.column("image_id")
    # the per-image python str list is only read by the PSNR/caption gate
    # and the odd-size fallback — the benchmarked fast path never pays it
    _ids_list: list | None = None

    def ids():
        nonlocal _ids_list
        if _ids_list is None:
            _ids_list = ids_arr.to_pylist()
        return _ids_list

    bufs = chunk.column("bytes").to_pylist()
    w = chunk.column("w").to_numpy()
    h = chunk.column("h").to_numpy()
    fmts = chunk.column("fmt").to_pylist()
    lon = chunk.column("lon").to_numpy()
    lat = chunk.column("lat").to_numpy()

    from spatial4n_spark.cellindex import cell_backend

    decoded = decode_image_batch(bufs, w, h, fmts)
    backend = cell_backend(index)
    cells = backend.kernel(lat, lon, level)
    cell_type = backend.arrow_type()
    cells_arr = pa.array(cells, cell_type)

    # fast-path per-group Arrow columns (concatenated once at the end)
    fast_cols: dict[str, list] = {k: [] for k in (
        "image_id", "cell", "chip_row", "chip_col",
        "chip_w", "chip_h", "chip_sum", "chip_mean", "chip",
    )}

    # slow-path collectors (odd sizes / chip-bytes materialization)
    out_id, out_cell, out_r, out_c = [], [], [], []
    out_w, out_h, out_sum, out_mean, out_bytes = [], [], [], [], []

    def emit_loop(k: int):
        """Per-image fallback (sizes not divisible by chip_px,
        or chip-bytes materialization)."""
        iid, cell, img = ids()[k], cells[k], decoded[k]
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
                out_sum.append(int(chip.astype(np.int64).sum()))
                out_mean.append(float(chip.mean()))
                out_bytes.append(chip.tobytes() if with_chip_bytes else b"")

    keep = np.ones(len(ids_arr), dtype=bool)
    sizes = np.stack([w, h], axis=1)
    groups = {}
    for wh in np.unique(sizes, axis=0):
        groups[tuple(wh)] = np.where((w == wh[0]) & (h == wh[1]))[0]

    if min_psnr_db is not None:
        caps = chunk.column("caption").to_pylist()
        for (gw, gh), sel in groups.items():
            imgs = np.stack([decoded[k] for k in sel])
            refs = _reference_pixels_batch([ids()[k] for k in sel], int(gw), int(gh))
            keep[sel] = _psnr_batch(imgs, refs) >= min_psnr_db
        for k in range(len(ids())):
            if keep[k]:
                expect = (
                    f"caption for img{int(ids()[k][3:])} at {lat[k]:.4f},{lon[k]:.4f}"
                )
                keep[k] = caps[k] == expect

    for (gw, gh), sel in groups.items():
        sel = sel[keep[sel]]
        if len(sel) == 0:
            continue
        if gw % chip_px or gh % chip_px or with_chip_bytes:
            for k in sel:
                emit_loop(int(k))
            continue
        # fully-divisible fast path: (k,h,w,3) -> chip grid means
        nr, nc = int(gh) // chip_px, int(gw) // chip_px
        imgs = np.stack([decoded[k] for k in sel])
        grid = imgs.reshape(len(sel), nr, chip_px, nc, chip_px, 3)
        # exact integer pixel sums: the mosaic aggregate downstream
        # is order-independent (integer partial sums), so results
        # are bit-stable under any shuffle/partitioning
        sums = grid.astype(np.int64).sum(axis=(2, 4, 5))  # (k, nr, nc)
        means = grid.astype(np.float64).mean(axis=(2, 4, 5))  # (k, nr, nc)
        n_chips = nr * nc
        total = n_chips * len(sel)
        rep_idx = pa.array(np.repeat(sel.astype(np.int64), n_chips))
        fast_cols["image_id"].append(ids_arr.take(rep_idx))
        fast_cols["cell"].append(cells_arr.take(rep_idx))
        fast_cols["chip_row"].append(
            pa.array(np.tile(np.repeat(np.arange(nr, dtype=np.int32), nc), len(sel)))
        )
        fast_cols["chip_col"].append(
            pa.array(np.tile(np.tile(np.arange(nc, dtype=np.int32), nr), len(sel)))
        )
        fast_cols["chip_w"].append(pa.array(np.full(total, chip_px, dtype=np.int32)))
        fast_cols["chip_h"].append(pa.array(np.full(total, chip_px, dtype=np.int32)))
        fast_cols["chip_sum"].append(pa.array(sums.reshape(-1)))
        fast_cols["chip_mean"].append(pa.array(means.reshape(-1)))
        fast_cols["chip"].append(pa.array(np.zeros(total, dtype="S1"), pa.binary()))

    if out_id:  # fold the slow-path rows in as one more Arrow chunk
        fast_cols["image_id"].append(pa.array(out_id, pa.string()))
        fast_cols["cell"].append(pa.array(out_cell, cell_type))
        fast_cols["chip_row"].append(pa.array(out_r, pa.int32()))
        fast_cols["chip_col"].append(pa.array(out_c, pa.int32()))
        fast_cols["chip_w"].append(pa.array(out_w, pa.int32()))
        fast_cols["chip_h"].append(pa.array(out_h, pa.int32()))
        fast_cols["chip_sum"].append(pa.array(out_sum, pa.int64()))
        fast_cols["chip_mean"].append(pa.array(out_mean, pa.float64()))
        fast_cols["chip"].append(pa.array(out_bytes, pa.binary()))

    names = [
        "image_id", "cell", "chip_row", "chip_col",
        "chip_w", "chip_h", "chip_sum", "chip_mean", "chip",
    ]
    empty_types = {
        "image_id": pa.string(), "cell": cell_type,
        "chip_row": pa.int32(), "chip_col": pa.int32(),
        "chip_w": pa.int32(), "chip_h": pa.int32(),
        "chip_sum": pa.int64(), "chip_mean": pa.float64(), "chip": pa.binary(),
    }
    return pa.RecordBatch.from_arrays(
        [
            pa.concat_arrays(fast_cols[n]) if fast_cols[n]
            else pa.array([], empty_types[n])
            for n in names
        ],
        names=names,
    )


CHIPS_SCHEMA_MULTI = (
    "image_id string, backend string, cell string, chip_row int, "
    "chip_col int, chip_w int, chip_h int, chip_sum long, chip_mean double"
)


def tile_images_multi(
    images: DataFrame,
    backends: list[tuple[str, int]],
    chip_px: int = 8,
    min_psnr_db: float | None = None,
    chunk_rows: int = 4096,
) -> DataFrame:
    """Chip each decoded image ONCE and tag every chip with EVERY cell
    backend's id (cast to string) under a ``backend`` column — the
    multi-index twin of tile_images.

    Decode is the expensive stage; the per-backend delta is one cheap
    cell-encode over per-IMAGE coordinates plus a duplicated aggregate
    row. Running the three backends through tile_images separately costs
    three full decode passes of the same 10^12-image table; this costs
    one.
    """

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                yield _tile_chunk_multi(
                    batch.slice(s, chunk_rows), backends, chip_px, min_psnr_db
                )

    return images.mapInArrow(run, CHIPS_SCHEMA_MULTI)


def _tile_chunk_multi(
    chunk: pa.RecordBatch,
    backends: list[tuple[str, int]],
    chip_px: int,
    min_psnr_db: float | None,
) -> pa.RecordBatch:
    """Decode + optional gate + chip of one Arrow chunk, emitting one
    chips row-group per backend (same Arrow-take construction as
    _tile_chunk; int64 cells become decimal strings — identical to SQL
    CAST(cell AS VARCHAR), so the per-backend oracles keep matching)."""
    from spatial4n_spark.cellindex import cell_backend

    ids_arr = chunk.column("image_id")
    bufs = chunk.column("bytes").to_pylist()
    w = chunk.column("w").to_numpy()
    h = chunk.column("h").to_numpy()
    fmts = chunk.column("fmt").to_pylist()
    lon = chunk.column("lon").to_numpy()
    lat = chunk.column("lat").to_numpy()
    decoded = decode_image_batch(bufs, w, h, fmts)

    cell_strs: list[tuple[str, pa.Array]] = []
    for bname, blevel in backends:
        cl = np.asarray(cell_backend(bname).kernel(lat, lon, blevel))
        if cl.dtype.kind in ("i", "u"):
            cl = cl.astype("U")
        cell_strs.append((bname, pa.array(cl, pa.string())))

    keep = np.ones(len(bufs), dtype=bool)
    sizes = np.stack([w, h], axis=1)
    groups = {}
    for wh in np.unique(sizes, axis=0):
        groups[tuple(wh)] = np.where((w == wh[0]) & (h == wh[1]))[0]

    ids_list: list | None = None
    if min_psnr_db is not None:
        ids_list = ids_arr.to_pylist()
        caps = chunk.column("caption").to_pylist()
        for (gw, gh), sel in groups.items():
            imgs = np.stack([decoded[k] for k in sel])
            refs = _reference_pixels_batch(
                [ids_list[k] for k in sel], int(gw), int(gh)
            )
            keep[sel] = _psnr_batch(imgs, refs) >= min_psnr_db
        for k in range(len(ids_list)):
            if keep[k]:
                expect = (
                    f"caption for img{int(ids_list[k][3:])} at {lat[k]:.4f},{lon[k]:.4f}"
                )
                keep[k] = caps[k] == expect

    names = [
        "image_id", "backend", "cell", "chip_row", "chip_col",
        "chip_w", "chip_h", "chip_sum", "chip_mean",
    ]
    cols: dict[str, list] = {k: [] for k in names}

    for (gw, gh), sel in groups.items():
        sel = sel[keep[sel]]
        if len(sel) == 0:
            continue
        if gw % chip_px or gh % chip_px:
            # odd-size fallback: per-image loop (never hit by the
            # generated corpus — sizes are multiples of chip_px)
            if ids_list is None:
                ids_list = ids_arr.to_pylist()
            for k in sel:
                img = decoded[k]
                hh, ww = img.shape[0], img.shape[1]
                for r0 in range(0, hh, chip_px):
                    for c0 in range(0, ww, chip_px):
                        chip = img[r0: r0 + chip_px, c0: c0 + chip_px]
                        for bi, (bname, carr) in enumerate(cell_strs):
                            cols["image_id"].append(pa.array([ids_list[k]]))
                            cols["backend"].append(pa.array([bname]))
                            cols["cell"].append(carr.take(pa.array([int(k)])))
                            cols["chip_row"].append(pa.array([r0 // chip_px], pa.int32()))
                            cols["chip_col"].append(pa.array([c0 // chip_px], pa.int32()))
                            cols["chip_w"].append(pa.array([chip.shape[1]], pa.int32()))
                            cols["chip_h"].append(pa.array([chip.shape[0]], pa.int32()))
                            cols["chip_sum"].append(pa.array([int(chip.astype(np.int64).sum())], pa.int64()))
                            cols["chip_mean"].append(pa.array([float(chip.mean())], pa.float64()))
            continue
        nr, nc = int(gh) // chip_px, int(gw) // chip_px
        imgs = np.stack([decoded[k] for k in sel])
        grid = imgs.reshape(len(sel), nr, chip_px, nc, chip_px, 3)
        sums = pa.array(grid.astype(np.int64).sum(axis=(2, 4, 5)).reshape(-1))
        means = pa.array(grid.astype(np.float64).mean(axis=(2, 4, 5)).reshape(-1))
        n_chips = nr * nc
        total = n_chips * len(sel)
        rep_idx = pa.array(np.repeat(sel.astype(np.int64), n_chips))
        id_take = ids_arr.take(rep_idx)
        rows_c = pa.array(np.tile(np.repeat(np.arange(nr, dtype=np.int32), nc), len(sel)))
        cols_c = pa.array(np.tile(np.tile(np.arange(nc, dtype=np.int32), nr), len(sel)))
        w_c = pa.array(np.full(total, chip_px, dtype=np.int32))
        h_c = w_c
        for bname, carr in cell_strs:
            cols["image_id"].append(id_take)
            cols["backend"].append(pa.array(np.full(total, bname), pa.string()))
            cols["cell"].append(carr.take(rep_idx))
            cols["chip_row"].append(rows_c)
            cols["chip_col"].append(cols_c)
            cols["chip_w"].append(w_c)
            cols["chip_h"].append(h_c)
            cols["chip_sum"].append(sums)
            cols["chip_mean"].append(means)

    empty_types = {
        "image_id": pa.string(), "backend": pa.string(), "cell": pa.string(),
        "chip_row": pa.int32(), "chip_col": pa.int32(),
        "chip_w": pa.int32(), "chip_h": pa.int32(),
        "chip_sum": pa.int64(), "chip_mean": pa.float64(),
    }
    return pa.RecordBatch.from_arrays(
        [
            pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols[n]])
            if cols[n] else pa.array([], empty_types[n])
            for n in names
        ],
        names=names,
    )


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

    # avg_brightness from exact integer partial sums (one final double
    # division): order-independent, so bit-stable under any shuffle order —
    # a float avg() over chip means would depend on reduction order
    return chips.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_chips"),
        F.sum(
            ((F.col("chip_row") == 0) & (F.col("chip_col") == 0)).cast("long")
        ).alias("n_images"),
        F.sum(F.col("chip_w") * F.col("chip_h")).alias("sum_px"),
        (
            F.sum("chip_sum") / (F.sum(F.col("chip_w") * F.col("chip_h")) * F.lit(3))
        ).alias("avg_brightness"),
    )


def raster_pipeline(
    images: DataFrame,
    level: int = 4,
    chip_px: int = 8,
    min_psnr_db: float = 40.0,
    index: str = "geohash",
) -> DataFrame:
    """decode -> PSNR/caption gate -> chip -> per-cell mosaic stats.

    One fused decode pass (gate inside tile_images), then a per-cell
    aggregation whose only shuffle carries small partial aggregates —
    images failing the gate are excluded at the source (at design scale
    they'd be routed to a quarantine table instead of dropped).
    """
    chips = tile_images(
        images, level, chip_px, min_psnr_db=min_psnr_db, index=index
    )
    return cell_mosaic_stats(chips)


def generate_raster_pipeline(
    spark,
    n_rows: int,
    level: int = 4,
    chip_px: int = 8,
    min_psnr_db: float = 40.0,
    partitions: int | None = None,
    chunk_rows: int = 1024,
    index: str = "geohash",
) -> DataFrame:
    """Fused source -> decode -> gate -> chip -> mosaic: the image payload
    never crosses the Arrow boundary (see generate_decode_check); only
    per-chip aggregates leave the Python stage, and the one shuffle
    carries per-cell partial sums."""
    from spatial4n_spark.sources.images import _gen_batch

    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(0).to_numpy()
            for s in range(0, len(ids), chunk_rows):
                yield _tile_chunk(
                    _gen_batch(ids[s : s + chunk_rows], True),
                    level,
                    chip_px,
                    False,
                    min_psnr_db,
                    index,
                )

    return cell_mosaic_stats(rng.mapInArrow(run, _chips_schema(index)))


def raster_pipeline_pyramid(
    images: DataFrame,
    level: int = 4,
    min_level: int = 1,
    chip_px: int = 8,
    min_psnr_db: float = 40.0,
    index: str = "geohash",
) -> DataFrame:
    """Multi-resolution raster overviews from ONE decode pass — the
    GDAL-overview / map-tile-pyramid analog of ``raster_pipeline``.

    The expensive stage (decode -> gate -> chip) runs once at the finest
    level; each chip row then explodes into its cell's ancestor chain
    (pure JVM parent expressions — geohash prefix, S2 bit-shift, same
    exact-nesting argument as ``tiles.tile_pyramid``) BEFORE the one
    aggregation, so every zoom level's mosaic stats come out of a single
    shuffle of partial sums.  Every aggregate stays an exact integer
    partial until the final division, so each level is bit-equal to
    running ``raster_pipeline`` directly at that level (pytest-pinned);
    ``n_images`` stays correct under rollup because an image's chips all
    carry one cell, so its single (0,0) chip counts it exactly once per
    ancestor.

    Returns (lvl, cell, n_chips, n_images, sum_px, avg_brightness).
    """
    from pyspark.sql import functions as F

    if index not in ("geohash", "s2"):
        raise ValueError(
            f"raster pyramid needs exactly-nesting cells (geohash or "
            f"s2); h3 aperture-7 children only approximately nest, "
            f"got {index!r}"
        )
    if not 0 <= min_level <= level:
        raise ValueError(f"need 0 <= min_level <= level, got {min_level}, {level}")
    chips = tile_images(
        images, level, chip_px, min_psnr_db=min_psnr_db, index=index
    )
    lvls = F.array(*[F.lit(int(x)) for x in range(min_level, level + 1)])
    if index == "geohash":
        parent = F.expr("substring(cell, 1, lvl)")
    else:
        parent = F.expr(f"shiftright(cell, ({int(level)} - lvl) * 2)")
    exploded = chips.select(F.explode(lvls).alias("lvl"), "*").withColumn(
        "cell", parent
    )
    return exploded.groupBy("lvl", "cell").agg(
        F.count(F.lit(1)).alias("n_chips"),
        F.sum(
            ((F.col("chip_row") == 0) & (F.col("chip_col") == 0)).cast("long")
        ).alias("n_images"),
        F.sum(F.col("chip_w") * F.col("chip_h")).alias("sum_px"),
        (
            F.sum("chip_sum") / (F.sum(F.col("chip_w") * F.col("chip_h")) * F.lit(3))
        ).alias("avg_brightness"),
    )
