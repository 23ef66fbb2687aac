"""Native C++ IO library tests: builds on demand, bit-identical vs numpy."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

from av1tpu.ingest.native import (
    native_available,
    probe_yuv,
    read_y_frames,
    tile_frames,
)
from av1tpu.ingest.tiler import tile_frames as tile_frames_np
from av1tpu.ingest.yuv import Yuv420p10Geometry, read_y_frames_batch

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    lib = REPO / "native" / "libav1tpu_io.so"
    if not lib.exists():
        result = subprocess.run(
            ["make", "-C", str(REPO / "native")], capture_output=True, text=True
        )
        if result.returncode != 0:
            pytest.skip(f"native build failed: {result.stderr[-500:]}")
    assert native_available()


def write_yuv(path, planes):
    f, h, w = planes.shape
    with open(path, "wb") as fh:
        for i in range(f):
            fh.write(planes[i].astype("<u2").tobytes())
            fh.write(np.zeros(((h + 1) // 2, (w + 1) // 2), dtype="<u2").tobytes() * 2)


def test_native_read_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    planes = rng.integers(0, 1024, size=(6, 48, 64), dtype=np.uint16)
    path = tmp_path / "clip_64x48_30.yuv"
    write_yuv(path, planes)
    geom = Yuv420p10Geometry(width=64, height=48)

    got = read_y_frames(path, geom, [0, 2, 5], num_threads=4)
    want = read_y_frames_batch(path, geom, [0, 2, 5])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got[1], planes[2])


def test_native_read_validates_range(tmp_path):
    planes = np.full((1, 16, 16), 2000, dtype=np.uint16)
    path = tmp_path / "bad_16x16_30.yuv"
    write_yuv(path, planes)
    geom = Yuv420p10Geometry(width=16, height=16)
    with pytest.raises(IOError):
        read_y_frames(path, geom, [0], validate_range=True)


def test_native_read_short_file(tmp_path):
    path = tmp_path / "short_32x32_30.yuv"
    path.write_bytes(b"\x00" * 100)
    geom = Yuv420p10Geometry(width=32, height=32)
    with pytest.raises(IOError):
        read_y_frames(path, geom, [0])


def test_native_tiling_bit_identical(tmp_path):
    rng = np.random.default_rng(1)
    # deliberately non-multiple dims to exercise zero padding
    frames = rng.integers(0, 1024, size=(3, 50, 70), dtype=np.uint16)
    got = tile_frames(frames, 16, num_threads=2)
    want, _ = tile_frames_np(frames, 16)
    np.testing.assert_array_equal(got, want)


def test_native_probe(tmp_path):
    planes = np.zeros((4, 32, 32), dtype=np.uint16)
    path = tmp_path / "clip_32x32_30.yuv"
    write_yuv(path, planes)
    geom = Yuv420p10Geometry(width=32, height=32)
    frames, remainder = probe_yuv(path, geom)
    assert frames == 4 and remainder == 0
