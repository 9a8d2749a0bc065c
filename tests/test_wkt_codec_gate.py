"""The wkt_codec gate pins must equal a live kernel recompute — if a
parser/writer/bbox/codec change shifts any value, this fails alongside
the (independently pinned) gate row."""

from __future__ import annotations

from spatial4n_spark.sources.wkt_corpus import (
    WKT_CODEC_EXPECTED,
    WKT_CORPUS,
    codec_row,
)


def test_pins_match_live_recompute():
    assert [wid for wid, _ in WKT_CORPUS] == [row[0] for row in WKT_CODEC_EXPECTED]
    for (wid, wkt), pin in zip(WKT_CORPUS, WKT_CODEC_EXPECTED):
        got = (wid,) + codec_row(wkt)
        assert got == pin, f"{wid}: {got} != {pin}"


def test_corpus_round_trips_binary():
    """Every corpus shape survives bytes -> shape -> bytes identically."""
    from spatial4n_spark.io.binary import shape_from_bytes, shape_to_bytes
    from spatial4n_spark.io.wkt import parse_wkt

    for wid, wkt in WKT_CORPUS:
        s = parse_wkt(wkt, True)
        b = shape_to_bytes(s, True)
        s2 = shape_from_bytes(b, True)
        assert shape_to_bytes(s2, True) == b, wid
