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


def _write_png_gray8(path, img, filters=False):
    """Minimal PNG encoder for test fixtures (gray8; optional Up/Sub filters
    to exercise the decoder's un-filtering)."""
    import struct
    import zlib

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + \
            struct.pack(">I", zlib.crc32(t + b))

    h, w = img.shape
    rows = []
    prev = np.zeros(w, np.int32)
    for y in range(h):
        r = img[y].astype(np.int32)
        if filters and y % 3 == 1:      # Up filter
            rows.append(b"\x02" + ((r - prev) & 0xFF).astype(np.uint8).tobytes())
        elif filters and y % 3 == 2:    # Sub filter
            d = r.copy()
            d[1:] = (r[1:] - r[:-1]) & 0xFF
            rows.append(b"\x01" + d.astype(np.uint8).tobytes())
        else:
            rows.append(b"\x00" + r.astype(np.uint8).tobytes())
        prev = r
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def test_png_decode(tmp_path):
    """EuRoC/TUM-VI ship PNGs — both the libpng path and the pure-Python
    fallback must decode gray8 exactly, for plain and filtered encodings."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (48, 64), np.uint8)
    for filt in (False, True):
        p = str(tmp_path / f"f{filt}.png")
        _write_png_gray8(p, img, filters=filt)
        np.testing.assert_array_equal(dataset.read_image(p), img)
        np.testing.assert_array_equal(dataset._read_image_py(p), img)


def test_prefetcher_mixed_formats(tmp_path):
    """The prefetcher dispatches on the file magic, so a sequence can mix
    PNG and PGM frames."""
    rng = np.random.default_rng(6)
    paths, imgs = [], []
    for i in range(4):
        img = rng.integers(0, 255, (32, 40), np.uint8)
        if i % 2 == 0:
            p = str(tmp_path / f"{i}.png")
            _write_png_gray8(p, img)
        else:
            p = str(tmp_path / f"{i}.pgm")
            with open(p, "wb") as f:
                f.write(b"P5\n40 32\n255\n" + img.tobytes())
        paths.append(p)
        imgs.append(img)
    pf = dataset.ImagePrefetcher(paths, depth=2)
    for i in range(4):
        np.testing.assert_array_equal(pf.get(i), imgs[i])
    pf.close()


def test_load_euroc_sequence(euroc_dir):
    seq = dataset.load_euroc_sequence(euroc_dir)
    assert len(seq["image_paths"]) == 6
    assert seq["gyro"].shape == (24, 3)
    assert seq["acc"].shape == (24, 3)


def test_evaluate_ate_cli(tmp_path):
    """The offline eval CLI (reference evaluation/evaluate_ate_scale.py
    protocol): recovers the mono scale and the noise-floor ATE."""
    import subprocess
    import sys
    rng = np.random.default_rng(0)
    t = np.arange(80) * 0.05
    p = np.stack([np.sin(t), np.cos(t), 0.1 * t], 1)

    def write(path, t, p, scale=1.0):
        with open(path, "w") as f:
            for i in range(len(t)):
                x = scale * p[i]
                f.write(f"{t[i]:.6f} {x[0]} {x[1]} {x[2]} 0 0 0 1\n")

    gt, est = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    write(gt, t, p)
    write(est, t + 0.001, p + rng.normal(0, 0.005, p.shape), scale=0.5)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "evaluation",
                                      "evaluate_ate_scale.py"), gt, est],
        capture_output=True, text=True, check=True)
    rmse, scale = (float(x) for x in out.stdout.strip().split(","))
    assert abs(scale - 2.0) < 0.05
    assert rmse < 0.02
