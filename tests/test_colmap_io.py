"""COLMAP model IO round-trip + calibration-conversion parity."""

import numpy as np

from consistent_depth_tpu.io import colmap_io


def _random_model(rng):
    cameras = {
        1: colmap_io.Camera(1, "SIMPLE_PINHOLE", 640, 480,
                            np.array([500.0, 320.0, 240.0])),
        2: colmap_io.Camera(2, "PINHOLE", 640, 480,
                            np.array([500.0, 510.0, 320.0, 240.0])),
    }
    images = {}
    for i in range(1, 4):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        n = rng.integers(0, 5)
        images[i] = colmap_io.Image(
            id=i, qvec=q, tvec=rng.standard_normal(3),
            camera_id=1 + (i % 2), name=f"frame_{i - 1:06d}.png",
            xys=rng.standard_normal((n, 2)),
            point3D_ids=rng.integers(-1, 100, n).astype(np.int64),
        )
    points = {
        7: colmap_io.Point3D(
            id=7, xyz=rng.standard_normal(3),
            rgb=np.array([10, 20, 30], np.uint8), error=1.5,
            image_ids=np.array([1, 2], np.int32),
            point2D_idxs=np.array([0, 1], np.int32),
        )
    }
    return cameras, images, points


def _assert_models_equal(a, b):
    ca, ia, pa = a
    cb, ib, pb = b
    assert set(ca) == set(cb) and set(ia) == set(ib) and set(pa) == set(pb)
    for k in ca:
        assert ca[k].model == cb[k].model
        assert (ca[k].width, ca[k].height) == (cb[k].width, cb[k].height)
        np.testing.assert_allclose(ca[k].params, cb[k].params)
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec)
        assert ia[k].name == ib[k].name
        np.testing.assert_allclose(ia[k].xys, ib[k].xys)
        np.testing.assert_array_equal(ia[k].point3D_ids, ib[k].point3D_ids)
    for k in pa:
        np.testing.assert_allclose(pa[k].xyz, pb[k].xyz)
        np.testing.assert_array_equal(pa[k].image_ids, pb[k].image_ids)


def test_bin_roundtrip(tmp_path):
    model = _random_model(np.random.default_rng(0))
    colmap_io.write_model(*model, str(tmp_path), ext=".bin")
    _assert_models_equal(model, colmap_io.read_model(str(tmp_path), ext=".bin"))


def test_txt_roundtrip(tmp_path):
    model = _random_model(np.random.default_rng(1))
    colmap_io.write_model(*model, str(tmp_path), ext=".txt")
    _assert_models_equal(model, colmap_io.read_model(str(tmp_path), ext=".txt"))


def test_bin_matches_reference_reader(tmp_path, reference_root):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_rwm",
        f"{reference_root}/third_party/colmap/scripts/python/read_write_model.py",
    )
    if spec is None or not spec.loader:
        import pytest
        pytest.skip("reference colmap scripts not checked out")
    try:
        ref_rwm = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_rwm)
    except FileNotFoundError:
        import pytest
        pytest.skip("reference colmap scripts not checked out")

    model = _random_model(np.random.default_rng(2))
    colmap_io.write_model(*model, str(tmp_path), ext=".bin")
    cameras = ref_rwm.read_cameras_binary(str(tmp_path / "cameras.bin"))
    images = ref_rwm.read_images_binary(str(tmp_path / "images.bin"))
    assert set(cameras) == set(model[0])
    for k, cam in cameras.items():
        np.testing.assert_allclose(cam.params, model[0][k].params)
    for k, im in images.items():
        np.testing.assert_allclose(im.qvec, model[1][k].qvec)
        assert im.name == model[1][k].name


def test_dense_array_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    for shape in [(11, 17), (5, 9, 3)]:
        arr = rng.standard_normal(shape).astype(np.float32)
        fn = str(tmp_path / "depth.geometric.bin")
        colmap_io.write_array(arr, fn)
        np.testing.assert_array_equal(colmap_io.read_array(fn), arr.squeeze())


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(10):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap_io.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(colmap_io.rotmat2qvec(R), q, atol=1e-8)


def test_calibration_conversion_roundtrip():
    """images -> extrinsics -> images is identity (basis change involutive)."""
    rng = np.random.default_rng(5)
    _, images, _ = _random_model(rng)
    for im in images.values():
        im.camera_id = 1
    extr = colmap_io.images_to_extrinsics(images, sorted(images))
    back = colmap_io.extrinsics_to_images(extr)
    for iid in images:
        np.testing.assert_allclose(back[iid].qvec, images[iid].qvec, atol=1e-8)
        np.testing.assert_allclose(back[iid].tvec, images[iid].tvec, atol=1e-8)
    # extrinsics are proper rigid transforms
    R = extr[:, :, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (len(extr), 1, 1)),
        atol=1e-12)


def test_calibration_matches_reference(tmp_path, reference_root):
    import sys
    sys.path.insert(0, reference_root)
    try:
        from utils import load_colmap as ref_lc
    except Exception:
        import pytest
        pytest.skip("reference load_colmap needs colmap scripts checkout")

    model = _random_model(np.random.default_rng(6))
    size_new = (384, 224)
    for im in model[1].values():
        im.camera_id = 1
    ours_i, ours_e = colmap_io.convert_calibration(model[0], model[1], size_new)
    theirs_i = ref_lc.cameras_to_intrinsics(
        model[0], [1] * len(model[1]), size_new)
    theirs_e = ref_lc.images_to_extrinsics(model[1], sorted(model[1]))
    np.testing.assert_allclose(ours_i, theirs_i)
    np.testing.assert_allclose(ours_e, theirs_e)
