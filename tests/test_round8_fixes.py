"""Round-8 advisor-finding regressions: every corrupt-input failure in
the media codecs must surface as ValueError (the decode_image /
image_resize / audio_features per-row null-route contract — anything
else kills the whole Arrow stage), the IVF centroid broadcast must not
accumulate per call, and chunk_documents must emit nothing for NULL
documents."""

import struct
import zlib

import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
    audio_features,
    decode_wav,
    encode_wav_pcm16,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.png import (
    _chunk,
    decode_png,
)


def _gray_jpeg(w=16, h=16, q=85):
    return encode_jpeg_gray([((x + y) % 17) * 3 for y in range(h) for x in range(w)], w, h, q)


class TestJpegCorruptInputs:
    def test_undefined_huffman_table_is_valueerror(self):
        payload = bytearray(_gray_jpeg())
        i = payload.index(b"\xff\xda")
        # SOS layout: FF DA len2 ns cs tt — point the scan at DC/AC
        # table id 3, which no DHT defined (was a stage-killing KeyError)
        payload[i + 6] = 0x33
        with pytest.raises(ValueError, match="Huffman table"):
            decode_jpeg(bytes(payload))

    def test_truncated_sof_is_valueerror(self):
        payload = _gray_jpeg()
        i = payload.index(b"\xff\xc0")
        with pytest.raises(ValueError):
            decode_jpeg(payload[: i + 7])  # mid-SOF-header cut

    def test_truncated_dht_values_is_valueerror(self):
        payload = bytearray(_gray_jpeg())
        i = payload.index(b"\xff\xc4")
        # shrink the DHT segment length so the value list is cut short
        seg_len = struct.unpack_from(">H", payload, i + 2)[0]
        del payload[i + 2 + 10 : i + 2 + seg_len]
        struct.pack_into(">H", payload, i + 2, 10)
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))


class TestPngCorruptInputs:
    def test_palette_index_out_of_range_is_valueerror(self):
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        plte = _chunk(b"PLTE", bytes(6))  # 2 palette entries (ids 0,1)
        raw = b"\x00" + bytes([0, 5])  # filter 0; index 5 >= 2
        idat = _chunk(b"IDAT", zlib.compress(raw))
        iend = _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="palette index"):
            decode_png(sig + ihdr + plte + idat + iend)

    def test_truncated_ihdr_is_valueerror(self):
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = _chunk(b"IHDR", struct.pack(">IIBBB", 2, 1, 8, 3, 0))  # 11 of 13 bytes
        with pytest.raises(ValueError):
            decode_png(sig + ihdr + _chunk(b"IEND", b""))


class TestWavZeroRate:
    def _zero_rate(self):
        payload = bytearray(encode_wav_pcm16([1, -1, 2, -2], 8000))
        i = payload.index(b"fmt ") + 8  # fmt body start
        struct.pack_into("<I", payload, i + 4, 0)  # sample_rate := 0
        return bytes(payload)

    def test_decode_rejects_zero_rate(self):
        with pytest.raises(ValueError, match="sample rate"):
            decode_wav(self._zero_rate())

    def test_features_stage_survives_zero_rate(self, spark):
        # the advisor's exact scenario: one zero-rate row must null-route,
        # not ZeroDivisionError the whole Arrow stage
        rows = [
            (1, bytearray(encode_wav_pcm16([10, -10, 10], 8000))),
            (2, bytearray(self._zero_rate())),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r.asDict() for r in audio_features(df).collect()}
        assert got[1]["decode_error"] is None and got[1]["duration_ms"] == 0
        assert got[2]["decode_error"] is not None and got[2]["duration_ms"] is None


class TestCentroidBroadcastRegistry:
    def test_same_centroids_reuse_one_broadcast(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions import (
            similarity as sim,
        )

        sim.release_ivf_broadcasts()
        cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        df = spark.createDataFrame(
            [(10, [0.9, 0.1]), (11, [0.2, 0.8])], "id long, vec array<double>"
        )
        a = sim.ivf_probe_assignments(df, cents, "id", "vec", 1, "qid")
        b = sim.ivf_probe_assignments(df, cents, "id", "vec", 1, "qid")
        assert len(sim._CENTROID_BROADCASTS) == 1  # reused, not stacked
        got_a = sorted((r["qid"], r["__list_id"]) for r in a.collect())
        got_b = sorted((r["qid"], r["__list_id"]) for r in b.collect())
        assert got_a == got_b == [(10, 0), (11, 1)]
        assert sim.release_ivf_broadcasts() == 1
        assert not sim._CENTROID_BROADCASTS
        # fresh call after release still works (new broadcast minted)
        c = sim.ivf_probe_assignments(df, cents, "id", "vec", 1, "qid")
        assert sorted((r["qid"], r["__list_id"]) for r in c.collect()) == got_a
        sim.release_ivf_broadcasts()


class TestChunkNullDocuments:
    def test_null_text_yields_no_chunks(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            chunk_documents,
        )

        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, None), (3, "")], "doc_id long, text string"
        )
        got = chunk_documents(df, "doc_id", "text", chunk_tokens=3, overlap=1).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert 2 not in by_doc  # NULL document: zero rows, no spurious chunk
        assert [r["chunk_text"] for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])] == [
            "a b c",
            "c d e",
            "e",
        ]
        # empty-but-non-null document keeps its single empty chunk
        assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 0
