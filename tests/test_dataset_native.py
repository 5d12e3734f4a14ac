"""Native C++ dataset runtime tests (CSV parse, PGM decode, prefetcher)."""
import os
import numpy as np
import pytest

from rover_slam_tpu.utils import dataset


@pytest.fixture(scope="module")
def euroc_dir(tmp_path_factory):
    """Synthesize a tiny EuRoC-layout sequence."""
    root = tmp_path_factory.mktemp("mav0")
    cam = root / "cam0"
    (cam / "data").mkdir(parents=True)
    imu = root / "imu0"
    imu.mkdir()
    rng = np.random.default_rng(0)
    n, w, h = 6, 64, 48
    with open(cam / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(n):
            ts = 1403636579763555584 + i * 50_000_000
            name = f"{ts}.pgm"
            f.write(f"{ts},{name}\n")
            img = rng.integers(0, 255, (h, w), dtype=np.uint8)
            with open(cam / "data" / name, "wb") as g:
                g.write(b"P5\n# synthetic\n%d %d\n255\n" % (w, h))
                g.write(img.tobytes())
    with open(imu / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for i in range(n * 4):
            ts = 1403636579763555584 + i * 12_500_000
            f.write(f"{ts},0.01,0.02,-0.01,0.1,-0.2,9.8\n")
    return str(root)


def test_native_builds():
    assert dataset.native_available(), "C++ dataset loader failed to build/load"


def test_csv_image_index(euroc_dir):
    t, names = dataset.read_csv(os.path.join(euroc_dir, "cam0", "data.csv"),
                                numeric=False)
    assert len(t) == 6 and len(names) == 6
    assert names[0].endswith(".pgm")
    np.testing.assert_allclose(np.diff(t), 0.05, rtol=1e-4)  # f64 ns-epoch precision


def test_csv_imu(euroc_dir):
    t, vals = dataset.read_csv(os.path.join(euroc_dir, "imu0", "data.csv"),
                               numeric=True)
    assert vals.shape == (24, 6)
    np.testing.assert_allclose(vals[0], [0.01, 0.02, -0.01, 0.1, -0.2, 9.8])
    np.testing.assert_allclose(np.diff(t), 0.0125, rtol=1e-4)


def test_pgm_roundtrip(euroc_dir):
    seq = dataset.load_euroc_sequence(euroc_dir)
    img = dataset.read_pgm(seq["image_paths"][2])
    assert img.shape == (48, 64)
    # vs python fallback decoder
    img_py = dataset._read_pgm_py(seq["image_paths"][2])
    np.testing.assert_array_equal(img, img_py)


def test_prefetcher_ordered(euroc_dir):
    seq = dataset.load_euroc_sequence(euroc_dir)
    pf = dataset.ImagePrefetcher(seq["image_paths"], depth=3)
    imgs = [pf.get(i) for i in range(len(seq["image_paths"]))]
    pf.close()
    for i, p in enumerate(seq["image_paths"]):
        np.testing.assert_array_equal(imgs[i], dataset.read_pgm(p))


def test_load_euroc_sequence(euroc_dir):
    seq = dataset.load_euroc_sequence(euroc_dir)
    assert len(seq["image_paths"]) == 6
    assert seq["gyro"].shape == (24, 3)
    assert seq["acc"].shape == (24, 3)
