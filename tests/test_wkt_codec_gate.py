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
    """Every codec-supported corpus shape survives bytes -> shape ->
    bytes identically; buffered lines are REJECTED (the reference's
    BinaryCodec throws Unsupported shape — pinned as bin_len=-1 in the
    corpus expectations)."""
    import pytest

    from spatial4n_spark.io.binary import shape_from_bytes, shape_to_bytes
    from spatial4n_spark.io.wkt import parse_wkt

    expected_len = {r[0]: r[7] for r in WKT_CODEC_EXPECTED}
    for wid, wkt in WKT_CORPUS:
        s = parse_wkt(wkt, True)
        if expected_len[wid] == -1:
            with pytest.raises(ValueError, match="buffered"):
                shape_to_bytes(s, True)
            continue
        b = shape_to_bytes(s, True)
        s2 = shape_from_bytes(b, True)
        assert shape_to_bytes(s2, True) == b, wid
