"""Native mosaic tile loader: format round trip, threaded extraction,
edge clamping, batch iteration, pipeline integration."""
import os

import numpy as np
import pytest

from pygpa_tpu import data


@pytest.fixture(scope="module")
def mosaic_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    arr = rng.uniform(0, 100, size=(300, 420)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("mosaic") / "scan.gpam")
    data.write_mosaic(path, arr)
    return path, arr


def test_open_info(mosaic_file):
    path, arr = mosaic_file
    with data.MosaicTiles(path) as mt:
        assert mt.shape == arr.shape
        assert mt.dtype == np.float32


def test_read_tiles_matches_numpy(mosaic_file):
    path, arr = mosaic_file
    with data.MosaicTiles(path, nthreads=4) as mt:
        origins = [(0, 0), (100, 50), (37, 123), (128, 256)]
        tiles = mt.read_tiles(origins, 64, normalize=False)
        for t, (y, x) in zip(tiles, origins):
            assert np.allclose(t, arr[y:y + 64, x:x + 64])


def test_normalize_subtracts_mean(mosaic_file):
    path, arr = mosaic_file
    with data.MosaicTiles(path) as mt:
        tiles = mt.read_tiles([(10, 10)], 64, normalize=True)
        ref = arr[10:74, 10:74]
        assert np.allclose(tiles[0], ref - ref.mean(), atol=1e-3)
        assert abs(tiles[0].mean()) < 1e-3


def test_edge_clamping(mosaic_file):
    path, arr = mosaic_file
    with data.MosaicTiles(path) as mt:
        t = mt.read_tiles([(280, 400)], 64, normalize=False)[0]
        # rows/cols beyond the border replicate the last one
        assert np.allclose(t[:20, :20], arr[280:300, 400:420])
        assert np.allclose(t[25, 5], arr[299, 405])
        assert np.allclose(t[5, 30], arr[285, 419])


def test_uint16_conversion(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 60000, size=(80, 90)).astype(np.uint16)
    path = str(tmp_path / "u16.gpam")
    data.write_mosaic(path, arr)
    with data.MosaicTiles(path) as mt:
        assert mt.dtype == np.uint16
        t = mt.read_tiles([(0, 0)], (80, 90), normalize=False)[0]
        assert np.allclose(t, arr.astype(np.float32))


def test_batches_cover_grid(mosaic_file):
    path, arr = mosaic_file
    with data.MosaicTiles(path) as mt:
        seen = []
        for tiles, coords in mt.batches(128, batch_size=4):
            assert tiles.shape == (4, 128, 128)
            assert tiles.dtype == np.float32
            seen.extend(coords)
        grid = mt.grid(128)
        assert seen == grid
        assert (0, 0) in seen


def test_pipeline_integration(tmp_path):
    """Feed loader batches through the batch displacement pipeline."""
    from pygpa_tpu.lattices import hexlattice_gen, generate_ks
    from pygpa_tpu.parallel import extract_displacement_field_batch
    big = np.array(hexlattice_gen(0.12, 9.0, order=1, size=256,
                                  dtype=np.float64)).astype(np.float32)
    path = str(tmp_path / "lat.gpam")
    data.write_mosaic(path, big)
    ks = np.array(generate_ks(0.12, 9.0))[:3]
    with data.MosaicTiles(path) as mt:
        tiles, coords = next(iter(mt.batches(128, batch_size=4)))
        us = np.array(extract_displacement_field_batch(tiles, ks))
        assert us.shape == (4, 2, 128, 128)
        assert np.isfinite(us).all()
