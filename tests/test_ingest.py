"""Ingest tests: YUV geometry, lossless reads, tiling, label join, ETL.

The label-join test includes a literal reimplementation of the reference's
sequential cursor loop (005:495-516) as the oracle, so the vectorized join is
proven bit-identical on randomized inputs.
"""
from pathlib import Path

import numpy as np
import pytest

from av1tpu.ingest import (
    EtlReport,
    Yuv420p10Geometry,
    extract_labeled_blocks,
    extract_sequence,
    join_blocks_with_labels,
    label_cols_from_units,
    parse_dump_file,
    read_y_frame,
    tile_frame,
    tile_frames,
    write_npz,
    write_reference_layout,
)
from av1tpu.data import load_reference_layout, load_npz_sequences


# ---------------------------------------------------------------------------
# Synthetic fixtures
# ---------------------------------------------------------------------------

def make_yuv(path: Path, width: int, height: int, num_frames: int, seed=0):
    """Write a synthetic yuv420p10le file; return the Y planes."""
    rng = np.random.default_rng(seed)
    geom = Yuv420p10Geometry(width=width, height=height)
    planes = rng.integers(0, 1024, size=(num_frames, height, width), dtype=np.uint16)
    cw, ch = (width + 1) // 2, (height + 1) // 2
    with open(path, "wb") as f:
        for i in range(num_frames):
            f.write(planes[i].astype("<u2").tobytes())
            chroma = rng.integers(0, 1024, size=(ch, cw), dtype=np.uint16)
            f.write(chroma.astype("<u2").tobytes())  # U
            f.write(chroma.astype("<u2").tobytes())  # V
    return planes, geom


def reference_join_oracle(block_cols, label_cols):
    """Literal transcription of the reference cursor loop (005:495-516)."""
    kept, matched = [], []
    label_idx = 0
    for block_idx in range(len(block_cols)):
        if label_idx >= len(label_cols):
            break
        if block_cols[block_idx] == label_cols[label_idx]:
            kept.append(block_idx)
            matched.append(label_idx)
            label_idx += 1
    return np.array(kept, dtype=np.int64), np.array(matched, dtype=np.int64)


# ---------------------------------------------------------------------------
# YUV reading
# ---------------------------------------------------------------------------

def test_geometry_arithmetic():
    g = Yuv420p10Geometry(width=1920, height=1080)
    assert g.y_bytes == 1920 * 1080 * 2
    assert g.frame_bytes == 1920 * 1080 * 2 + 2 * 960 * 540 * 2


def test_lossless_frame_read(tmp_path):
    planes, geom = make_yuv(tmp_path / "clip_64x48_30.yuv", 64, 48, 3)
    for i in range(3):
        got = read_y_frame(tmp_path / "clip_64x48_30.yuv", i, geom)
        np.testing.assert_array_equal(got, planes[i])


def test_range_validation(tmp_path):
    path = tmp_path / "bad_16x16_30.yuv"
    geom = Yuv420p10Geometry(width=16, height=16)
    bad = np.full((16, 16), 2000, dtype="<u2")
    chroma = np.zeros((8, 8), dtype="<u2")
    path.write_bytes(bad.tobytes() + chroma.tobytes() * 2)
    with pytest.raises(ValueError, match="10-bit"):
        read_y_frame(path, 0, geom)


# ---------------------------------------------------------------------------
# Tiling
# ---------------------------------------------------------------------------

def test_tile_frame_row_major_exact():
    h, w, bs = 8, 12, 4
    plane = np.arange(h * w, dtype=np.uint16).reshape(h, w)
    blocks, grid = tile_frame(plane, bs)
    assert grid.num_rows == 2 and grid.num_cols == 3
    # Block 0 is the top-left bs x bs region
    np.testing.assert_array_equal(blocks[0], plane[:4, :4])
    # Block 1 is to its right (row-major)
    np.testing.assert_array_equal(blocks[1], plane[:4, 4:8])
    # Block 3 starts the second block-row
    np.testing.assert_array_equal(blocks[3], plane[4:8, :4])


def test_tile_frame_padding():
    plane = np.ones((10, 10), dtype=np.uint16)
    blocks, grid = tile_frame(plane, 8)
    assert grid.num_blocks == 4
    # bottom-right block is mostly zero padding
    assert blocks[3][2:, :].sum() == 0 and blocks[3][:2, :2].sum() == 4


def test_tile_frames_batch_matches_single():
    rng = np.random.default_rng(0)
    planes = rng.integers(0, 1024, size=(3, 17, 23), dtype=np.uint16)
    batch, _ = tile_frames(planes, 8)
    singles = [tile_frame(p, 8)[0] for p in planes]
    np.testing.assert_array_equal(batch, np.concatenate(singles, axis=0))


# ---------------------------------------------------------------------------
# Label join (bit-identical to reference loop)
# ---------------------------------------------------------------------------

def test_label_col_unit_conversion():
    # 4-px units: col 8 at block 16 -> (8/16)*4 = 2
    np.testing.assert_array_equal(
        label_cols_from_units(np.array([0, 8, 16, 24]), 16), [0, 2, 4, 6]
    )


@pytest.mark.parametrize("trial", range(20))
def test_join_matches_reference_oracle(trial):
    rng = np.random.default_rng(trial)
    num_cols = int(rng.integers(2, 12))
    num_rows = int(rng.integers(1, 8))
    block_cols = np.tile(np.arange(num_cols), num_rows)
    # Labels: a random subsequence of block cols, possibly with mismatches
    n_labels = int(rng.integers(0, len(block_cols)))
    label_cols = rng.integers(0, num_cols + 2, size=n_labels)  # some unmatched
    kept_ref, matched_ref = reference_join_oracle(block_cols, label_cols)
    kept, matched = join_blocks_with_labels(block_cols, label_cols)
    np.testing.assert_array_equal(kept, kept_ref)
    np.testing.assert_array_equal(matched, matched_ref)


def test_join_rejects_excess_labels():
    with pytest.raises(ValueError):
        join_blocks_with_labels(np.array([0, 1]), np.array([0, 1, 0]))


# ---------------------------------------------------------------------------
# Dump parse + end-to-end ETL
# ---------------------------------------------------------------------------

def write_dump(path: Path, frame: int, rows):
    lines = [
        f"{frame} {ft} {bs} {r} {c} {m} {qp}" for (ft, bs, r, c, m, qp) in rows
    ]
    path.write_text("\n".join(lines) + "\n")


def test_parse_dump_file(tmp_path):
    dump = tmp_path / "partition_frame_0.txt"
    write_dump(
        dump,
        0,
        [
            (0, 12, 0, 0, 3, 100),   # intra 64x64 SPLIT
            (0, 9, 0, 0, 0, 100),    # intra 32x32 NONE
            (1, 12, 0, 16, 0, 100),  # inter — filtered out
            (0, 12, 0, 16, 1, 110),  # intra 64x64 HORZ
        ],
    )
    result = parse_dump_file(dump)
    assert result.intra_blocks == 3
    assert set(result.per_block_size) == {64, 32}
    fb64 = result.per_block_size[64]
    np.testing.assert_array_equal(fb64.modes, [3, 1])
    np.testing.assert_array_equal(fb64.qps, [100, 110])
    np.testing.assert_array_equal(fb64.col_units, [0, 16])


def test_etl_end_to_end_roundtrip(tmp_path):
    """YUV + dump -> extract -> write reference layout -> reference loader
    reads byte-identical blocks and labels."""
    width, height = 128, 64  # 2x1 grid of 64x64 superblocks
    planes, geom = make_yuv(tmp_path / "seq_128x64_30.yuv", width, height, 2)
    dump_dir = tmp_path / "dumps"
    dump_dir.mkdir()
    # frame 0: both 64-blocks labeled; col units are 4-px: col 16 units = 64px
    write_dump(
        dump_dir / "partition_frame_0.txt",
        0,
        [(0, 12, 0, 0, 3, 90), (0, 12, 0, 16, 0, 95)],
    )
    # frame 1: only second block labeled
    write_dump(
        dump_dir / "partition_frame_1.txt",
        1,
        [(0, 12, 0, 16, 1, 80)],
    )

    extracts, report = extract_sequence(
        tmp_path / "seq_128x64_30.yuv", dump_dir, block_sizes=(64,)
    )
    assert report.frames_processed == 2
    ext = extracts[64]
    assert ext.num_blocks == 3
    np.testing.assert_array_equal(ext.modes, [3, 0, 1])
    np.testing.assert_array_equal(ext.qps, [90, 95, 80])
    # Block content: frame0 blocks [0:64], [64:128]; frame1 block [64:128]
    np.testing.assert_array_equal(ext.blocks[0], planes[0][:, :64])
    np.testing.assert_array_equal(ext.blocks[1], planes[0][:, 64:])
    np.testing.assert_array_equal(ext.blocks[2], planes[1][:, 64:])

    # Reference-layout writeout -> reference-semantics loader round trip
    out = tmp_path / "layout"
    write_reference_layout(extracts, out, "seq", verify=True)
    record = load_reference_layout(out, "64")
    np.testing.assert_array_equal(record.samples[..., 0], ext.blocks)
    np.testing.assert_array_equal(record.labels, ext.modes)
    np.testing.assert_array_equal(record.qps, ext.qps)

    # Native npz round trip
    npz_dir = tmp_path / "npz"
    write_npz(extracts, npz_dir, "seq")
    record2 = load_npz_sequences(npz_dir, 64)
    np.testing.assert_array_equal(record2.samples, record.samples)
    np.testing.assert_array_equal(record2.labels, record.labels)


def test_etl_constant_qp_compat(tmp_path):
    width, height = 64, 64
    make_yuv(tmp_path / "seq_64x64_30.yuv", width, height, 1)
    dump_dir = tmp_path / "dumps"
    dump_dir.mkdir()
    write_dump(dump_dir / "partition_frame_0.txt", 0, [(0, 12, 0, 0, 3, 123)])
    extracts, _ = extract_sequence(
        tmp_path / "seq_64x64_30.yuv", dump_dir, block_sizes=(64,), qp_mode="constant80"
    )
    np.testing.assert_array_equal(extracts[64].qps, [80])


class TestXlsxInterchange:
    """Excel L0 contract (reference 004:145-172 / 007:59-99): write + read
    without openpyxl, and ingestion parity with raw dumps."""

    def _dump_dir(self, tmp_path):
        dumps = tmp_path / "dumps"
        dumps.mkdir()
        for fi in range(3):
            lines = [
                f"{fi} 0 6 0 {c} {(fi + i) % 8} {90 + fi}"
                for i, c in enumerate(range(0, 32, 4))
            ]
            # one 64px block + one non-intra line that must be filtered
            lines.append(f"{fi} 0 12 0 0 3 {90 + fi}")
            lines.append(f"{fi} 1 6 0 0 1 {90 + fi}")
            (dumps / f"partition_frame_{fi}.txt").write_text("\n".join(lines))
        return dumps

    def test_roundtrip_matches_dump_parse(self, tmp_path):
        from av1tpu.ingest.partition_dump import parse_dump_directory
        from av1tpu.ingest.xlsx import (
            export_dump_dir_to_xlsx, parse_xlsx_directory,
        )

        dumps = self._dump_dir(tmp_path)
        xlsx_dir = tmp_path / "xlsx"
        written = export_dump_dir_to_xlsx(dumps, xlsx_dir, "clip")
        assert [p.name for p in written] == [
            f"clip-intra-{i}.xlsx" for i in range(3)
        ]

        from_txt = parse_dump_directory(dumps)
        from_xlsx = parse_xlsx_directory(xlsx_dir)
        assert len(from_txt) == len(from_xlsx)
        for a, b in zip(from_txt, from_xlsx):
            assert a.frame_index == b.frame_index
            assert a.intra_blocks == b.intra_blocks
            assert set(a.per_block_size) == set(b.per_block_size)
            for px, blocks_a in a.per_block_size.items():
                blocks_b = b.per_block_size[px]
                # xlsx rows are (row, col)-sorted per the reference writer;
                # sort the dump rows the same way before comparing
                order = np.lexsort((blocks_a.col_units, blocks_a.row_units))
                np.testing.assert_array_equal(
                    blocks_a.row_units[order], blocks_b.row_units)
                np.testing.assert_array_equal(
                    blocks_a.col_units[order], blocks_b.col_units)
                np.testing.assert_array_equal(
                    blocks_a.modes[order], blocks_b.modes)
                np.testing.assert_array_equal(
                    blocks_a.qps[order], blocks_b.qps)

    def test_extract_sequence_from_xlsx(self, tmp_path):
        from av1tpu.ingest.etl import extract_sequence
        from av1tpu.ingest.xlsx import export_dump_dir_to_xlsx

        dumps = self._dump_dir(tmp_path)
        xlsx_dir = tmp_path / "xlsx"
        export_dump_dir_to_xlsx(dumps, xlsx_dir, "clip")

        rng = np.random.default_rng(0)
        yuv = tmp_path / "clip_128x64_30.yuv"
        with open(yuv, "wb") as f:
            for _ in range(3):
                f.write(rng.integers(0, 1024, (64, 128), dtype=np.uint16)
                        .astype("<u2").tobytes())
                f.write(np.zeros((32, 64), dtype="<u2").tobytes() * 2)

        ex_txt, _ = extract_sequence(yuv, dumps, block_sizes=(16,))
        ex_xlsx, _ = extract_sequence(
            yuv, xlsx_dir, block_sizes=(16,), dump_format="xlsx"
        )
        np.testing.assert_array_equal(
            ex_txt[16].blocks, ex_xlsx[16].blocks)
        np.testing.assert_array_equal(ex_txt[16].modes, ex_xlsx[16].modes)
        np.testing.assert_array_equal(ex_txt[16].qps, ex_xlsx[16].qps)
