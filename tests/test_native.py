import numpy as np
import pytest

from lv_slam_tpu import native


@pytest.fixture(scope="module")
def built():
    try:
        native.build()
    except Exception as e:
        pytest.skip(f"no native toolchain: {e}")
    assert native.available()


@pytest.fixture()
def bin_files(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(6):
        arr = rng.normal(size=(1000 + i * 37, 4)).astype(np.float32)
        p = tmp_path / f"{i:06d}.bin"
        arr.tofile(p)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


def test_load_bin(built, bin_files):
    paths, arrays = bin_files
    out = native.load_bin(paths[0])
    np.testing.assert_array_equal(out, arrays[0])


def test_load_bin_clips(built, bin_files):
    paths, arrays = bin_files
    out = native.load_bin(paths[1], max_points=100)
    np.testing.assert_array_equal(out, arrays[1][:100])


def test_load_pcd(built, tmp_path, rng):
    from lv_slam_tpu.io.pcd import write_pcd

    pts = rng.normal(size=(500, 4)).astype(np.float32)
    p = str(tmp_path / "cloud.pcd")
    write_pcd(p, pts)
    out = native.load_pcd(p)
    np.testing.assert_allclose(out, pts, rtol=1e-6)


def test_prefetcher_order(built, bin_files):
    paths, arrays = bin_files
    with native.ScanPrefetcher(paths, n_threads=3, queue_depth=2) as pf:
        got = list(pf)
    assert len(got) == len(arrays)
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, a)
