"""App-level smoke test: the CLI driver runs a synthetic EuRoC-layout
sequence end-to-end (native loader -> SuperPoint -> SLAM -> TUM trajectory)
for the mono and stereo sensor configs (reference: the Examples/ mains)."""
import os

import numpy as np
import pytest
import yaml

from rover_slam_tpu.apps import run_euroc


@pytest.fixture(scope="module")
def euroc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mav0")
    rng = np.random.default_rng(0)
    h, w, n = 120, 160, 5
    for cam in ("cam0", "cam1"):
        d = root / cam / "data"
        d.mkdir(parents=True)
        with open(root / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for i in range(n):
                ts = 1403636579763555584 + i * 50_000_000
                f.write(f"{ts},{ts}.pgm\n")
                img = rng.integers(0, 255, (h, w), dtype=np.uint8)
                with open(d / f"{ts}.pgm", "wb") as g:
                    g.write(b"P5\n%d %d\n255\n" % (w, h) + img.tobytes())
    imu = root / "imu0"
    imu.mkdir()
    with open(imu / "data.csv", "w") as f:
        f.write("#t,wx,wy,wz,ax,ay,az\n")
        for i in range(n * 10):
            ts = 1403636579763555584 + i * 5_000_000
            f.write(f"{ts},0.0,0.0,0.0,0.0,0.0,9.81\n")
    settings = {
        "Camera.type": "PinHole",
        "Camera1.fx": 100.0, "Camera1.fy": 100.0,
        "Camera1.cx": 80.0, "Camera1.cy": 60.0,
        "Camera.width": w, "Camera.height": h, "Camera.fps": 20.0,
        "Camera.bf": 10.0,
        "ORBextractor.nFeatures": 128,
        "loopClosing": 0,
    }
    spath = str(root / "settings.yaml")
    with open(spath, "w") as f:
        yaml.safe_dump(settings, f)
    return str(root), spath


def test_mono_app_runs(euroc_root, tmp_path):
    root, settings = euroc_root
    out = str(tmp_path / "traj_mono.txt")
    rc = run_euroc.main([settings, root, "--sensor", "monocular",
                         "--out", out, "--max-frames", "4"])
    assert rc == 0
    assert os.path.exists(out)


def test_stereo_app_runs(euroc_root, tmp_path):
    root, settings = euroc_root
    out = str(tmp_path / "traj_stereo.txt")
    rc = run_euroc.main([settings, root, "--sensor", "stereo",
                         "--out", out, "--max-frames", "4"])
    assert rc == 0
    assert os.path.exists(out)


def test_atlas_save_load_via_settings(euroc_root, tmp_path):
    """System.SaveAtlasToFile persists the Atlas at the end of a run;
    System.LoadAtlasFromFile resumes from it (reference System::SaveAtlas /
    LoadAtlas multi-session mechanism, src/System.cc:1476-1594)."""
    import yaml as _yaml
    from rover_slam_tpu.utils.config import load_settings, build_system

    root, settings = euroc_root
    with open(settings) as f:
        d = _yaml.safe_load(f)
    atlas_path = str(tmp_path / "atlas.npz")
    d["System.SaveAtlasToFile"] = atlas_path
    s2 = str(tmp_path / "settings_save.yaml")
    with open(s2, "w") as f:
        _yaml.safe_dump(d, f)
    rc = run_euroc.main([s2, root, "--sensor", "monocular",
                         "--out", str(tmp_path / "t.txt"),
                         "--max-frames", "3"])
    assert rc == 0
    assert os.path.exists(atlas_path)

    d.pop("System.SaveAtlasToFile")
    d["System.LoadAtlasFromFile"] = atlas_path
    slam = build_system(load_settings(d, sensor="monocular"))
    assert slam.n_kf == int(slam.state.n_kf)
