"""Data-layer tests: synthetic determinism, feeder contract, augmentation
invariants, and format-level loader tests against tiny self-generated files
(SURVEY.md §4.2 — no real datasets on this box)."""

import numpy as np

from pointnet12_tpu.data import (
    Feeder,
    SyntheticModelNet,
    SyntheticScene,
    augment,
)


# --------------------------------------------------------------- synthetic


def test_synthetic_modelnet_deterministic_and_normalized():
    ds = SyntheticModelNet("train", num_point=256, num_classes=8, size=32)
    p1, l1 = ds[3]
    p2, l2 = ds[3]
    np.testing.assert_array_equal(p1, p2)
    assert l1 == l2 == 3
    assert p1.shape == (256, 3)
    assert np.max(np.linalg.norm(p1, axis=1)) <= 1.0 + 1e-5


def test_synthetic_train_test_disjoint():
    tr = SyntheticModelNet("train", num_point=64, num_classes=4, size=8)
    te = SyntheticModelNet("test", num_point=64, num_classes=4, size=8)
    assert not np.allclose(tr[0][0], te[0][0])


def test_synthetic_scene_contract():
    ds = SyntheticScene("train", num_point=512, num_classes=13, size=4)
    pts, lbl = ds[0]
    assert pts.shape == (512, 9) and lbl.shape == (512,)
    assert lbl.min() >= 0 and lbl.max() < 13
    # normalized-xyz channels in [0, 1]
    assert pts[:, 6:].min() >= 0 and pts[:, 6:].max() <= 1 + 1e-6
    # both structural classes present
    assert 0 in lbl and 1 in lbl


# ------------------------------------------------------------------ feeder


def test_feeder_fixed_shapes_and_drop_last():
    ds = SyntheticModelNet("train", num_point=64, num_classes=4, size=22)
    feeder = Feeder(ds, batch_size=8, shuffle=True, prefetch=False)
    batches = list(feeder)
    assert len(batches) == 2  # 22 // 8, last partial dropped
    for b in batches:
        assert b["points"].shape == (8, 64, 3)
        assert b["label"].shape == (8,)


def test_feeder_prefetch_equals_sync():
    ds = SyntheticModelNet("train", num_point=32, num_classes=4, size=16)
    a = list(Feeder(ds, 4, shuffle=True, seed=5, prefetch=False))
    b = list(Feeder(ds, 4, shuffle=True, seed=5, prefetch=True))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["points"], y["points"])
        np.testing.assert_array_equal(x["label"], y["label"])


def test_feeder_shuffles_across_epochs():
    ds = SyntheticModelNet("train", num_point=16, num_classes=4, size=32)
    f = Feeder(ds, 8, shuffle=True, prefetch=False)
    e1 = [b["label"] for b in f]
    e2 = [b["label"] for b in f]
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))


def test_feeder_prefetch_propagates_worker_exception():
    """A raise inside the prefetch worker (bad file, augment bug) must
    surface in the consumer, not silently truncate the epoch."""
    import pytest

    ds = SyntheticModelNet("train", num_point=16, num_classes=4, size=32)

    calls = []

    def bad_augment(points, rng):
        calls.append(1)
        if len(calls) >= 3:
            raise ValueError("corrupt batch")
        return points

    f = Feeder(ds, 8, augment_fn=bad_augment, prefetch=True)
    seen = 0
    with pytest.raises(ValueError, match="corrupt batch"):
        for _ in f:
            seen += 1
    # the two good batches were delivered before the raise surfaced
    assert seen == 2


def test_feeder_stat_batches_do_not_advance_epoch():
    """precise-BN stat passes must not shift the training shuffle/augment
    stream (they iterate a side channel, not the epoch iterator)."""
    ds = SyntheticModelNet("train", num_point=16, num_classes=4, size=32)
    f = Feeder(ds, 8, shuffle=True, prefetch=False)
    e1 = [b["label"] for b in f]  # epoch 0
    g = Feeder(ds, 8, shuffle=True, prefetch=False)
    _ = [b["label"] for b in g]  # epoch 0
    stats = list(g.stat_batches(2))  # must NOT bump g's epoch counter
    assert len(stats) == 2 and stats[0]["points"].shape == (8, 16, 3)
    e2_f = [b["label"] for b in f]  # f: epoch 1
    e2_g = [b["label"] for b in g]  # g: epoch 1 — identical iff no bump
    for a, b in zip(e2_f, e2_g):
        np.testing.assert_array_equal(a, b)


# ----------------------------------------------------------- augmentations


def test_rotation_preserves_norms():
    rng = np.random.RandomState(0)
    batch = rng.randn(4, 128, 3).astype(np.float32)
    rot = augment.rotate_point_cloud(batch, rng=rng)
    np.testing.assert_allclose(
        np.linalg.norm(batch, axis=-1),
        np.linalg.norm(rot, axis=-1),
        atol=1e-4,
    )
    rotz = augment.rotate_point_cloud_z(batch, rng=rng)
    np.testing.assert_array_almost_equal(rotz[..., 2], batch[..., 2])


def test_jitter_bounded():
    batch = np.zeros((2, 64, 3), np.float32)
    out = augment.jitter_point_cloud(batch, sigma=0.01, clip=0.05)
    assert np.abs(out).max() <= 0.05 + 1e-7
    assert np.abs(out).max() > 0


def test_dropout_replaces_with_first_point():
    rng = np.random.RandomState(3)
    batch = rng.randn(2, 128, 3).astype(np.float32)
    out = augment.random_point_dropout(batch, rng=rng)
    changed = ~np.all(out == batch, axis=-1)
    first = batch[:, 0:1, :]
    for b in range(2):
        if changed[b].any():
            np.testing.assert_array_equal(
                out[b][changed[b]],
                np.broadcast_to(first[b], (changed[b].sum(), 3)),
            )


def test_augment_only_touches_xyz():
    rng = np.random.RandomState(4)
    batch = rng.randn(2, 64, 9).astype(np.float32)
    out = augment.segmentation_augment(batch, rng=rng)
    np.testing.assert_array_equal(out[..., 3:], batch[..., 3:])


# ------------------------------------------------- format-level h5 loaders


def test_modelnet40_h5_format(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    for split, n in [("train", 12), ("test", 6)]:
        with h5py.File(tmp_path / f"ply_data_{split}0.h5", "w") as f:
            f["data"] = rng.randn(n, 128, 3).astype(np.float32)
            f["label"] = rng.randint(0, 40, (n, 1)).astype(np.uint8)
    from pointnet12_tpu.data.modelnet40 import ModelNet40H5

    ds = ModelNet40H5(str(tmp_path), "train", num_point=64)
    assert len(ds) == 12
    pts, lbl = ds[0]
    assert pts.shape == (64, 3) and 0 <= int(lbl) < 40
    assert np.max(np.linalg.norm(pts, axis=1)) <= 1.0 + 1e-5  # normalized


def test_modelnet40_txt_format(tmp_path):
    rng = np.random.RandomState(0)
    classes = ["airplane", "bed"]
    (tmp_path / "modelnet40_shape_names.txt").write_text("\n".join(classes))
    train_ids, test_ids = [], []
    for c in classes:
        (tmp_path / c).mkdir()
        for i in range(3):
            sid = f"{c}_{i:04d}"
            pts = rng.randn(200, 6).astype(np.float32)
            np.savetxt(tmp_path / c / f"{sid}.txt", pts, delimiter=",")
            (train_ids if i < 2 else test_ids).append(sid)
    (tmp_path / "modelnet40_train.txt").write_text("\n".join(train_ids))
    (tmp_path / "modelnet40_test.txt").write_text("\n".join(test_ids))

    from pointnet12_tpu.data.modelnet40 import ModelNet40Txt

    tr = ModelNet40Txt(str(tmp_path), "train", num_point=128)
    te = ModelNet40Txt(str(tmp_path), "test", num_point=128, use_normals=True)
    assert len(tr) == 4 and len(te) == 2
    pts, lbl = tr[0]
    assert pts.shape == (128, 3) and int(lbl) == 0
    ptsn, _ = te[0]
    assert ptsn.shape == (128, 6)
    assert np.max(np.linalg.norm(pts, axis=1)) <= 1.0 + 1e-5


def test_s3dis_h5_format(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    with h5py.File(tmp_path / "ply_data_all_0.h5", "w") as f:
        f["data"] = rng.rand(10, 256, 9).astype(np.float32)
        f["label"] = rng.randint(0, 13, (10, 256)).astype(np.uint8)
    rooms = [("Area_5_office" if i % 2 else "Area_1_office") for i in range(10)]
    (tmp_path / "room_filelist.txt").write_text("\n".join(rooms))
    from pointnet12_tpu.data.s3dis import S3DISH5

    tr = S3DISH5(str(tmp_path), "train", test_area=5, num_point=256)
    te = S3DISH5(str(tmp_path), "test", test_area=5, num_point=256)
    assert len(tr) == 5 and len(te) == 5
    pts, lbl = tr[0]
    assert pts.shape == (256, 9) and lbl.shape == (256,)


def test_s3dis_prep_roundtrip(tmp_path):
    """Raw Stanford3dDataset tree -> prep tool -> S3DISH5 loader."""
    rng = np.random.RandomState(0)
    for area, room in [("Area_1", "office_1"), ("Area_5", "office_2")]:
        ann = tmp_path / "raw" / area / room / "Annotations"
        ann.mkdir(parents=True)
        for cls, k in [("floor", 1), ("wall", 1), ("chair", 2)]:
            pts = np.concatenate(
                [rng.uniform(0, 2.0, (300, 3)), rng.randint(0, 255, (300, 3))],
                axis=1,
            )
            np.savetxt(ann / f"{cls}_{k}.txt", pts, fmt="%.3f")

    from pointnet12_tpu.cli import prepare_s3dis

    out = tmp_path / "h5"
    prepare_s3dis.main(
        ["--root", str(tmp_path / "raw"), "--out", str(out),
         "--num_point", "256"]
    )
    from pointnet12_tpu.data.s3dis import S3DISH5

    tr = S3DISH5(str(out), "train", test_area=5, num_point=256)
    te = S3DISH5(str(out), "test", test_area=5, num_point=256)
    assert len(tr) > 0 and len(te) > 0
    pts, lbl = tr[0]
    assert pts.shape == (256, 9) and lbl.shape == (256,)
    assert pts[:, 3:6].min() >= 0 and pts[:, 3:6].max() <= 1  # rgb scaled
    assert set(np.unique(lbl)) <= {1, 2, 8, 12}  # floor/wall/chair(/clutter)


def test_kitti_raw_and_prep_roundtrip(tmp_path):
    from pointnet12_tpu.data import semantic_kitti as sk

    rng = np.random.RandomState(0)
    seq = tmp_path / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir(parents=True)
    raw_ids = np.asarray(list(sk.LEARNING_MAP))
    for i in range(3):
        scan = rng.randn(500 + 100 * i, 4).astype(np.float32)
        scan.tofile(seq / "velodyne" / f"{i:06d}.bin")
        lbl = rng.choice(raw_ids, len(scan)).astype(np.uint32)
        lbl |= np.uint32(1 << 16)  # instance bits must be masked off
        lbl.tofile(seq / "labels" / f"{i:06d}.label")

    ds = sk.SemanticKITTIScans(str(tmp_path), "train", num_point=256)
    assert len(ds) == 3
    pts, lbl = ds[0]
    assert pts.shape == (256, 4) and lbl.shape == (256,)
    assert lbl.min() >= 0 and lbl.max() < sk.NUM_CLASSES

    out = tmp_path / "h5"
    written = sk.prepare_h5(str(tmp_path), str(out), "train", num_point=256)
    assert len(written) == 1
    ds2 = sk.SemanticKITTIH5(str(out), "train", num_point=256)
    assert len(ds2) == 3
    p2, l2 = ds2[0]
    np.testing.assert_array_equal(p2, pts)
    np.testing.assert_array_equal(l2, lbl)


def test_kitti_yaml_label_map(tmp_path):
    """Custom semantic-kitti.yaml learning_map flows through the raw loader
    and the prep tool (reference's label-map config; SURVEY.md §5)."""
    import pointnet12_tpu.data.semantic_kitti as sk

    yaml_path = tmp_path / "custom.yaml"
    yaml_path.write_text(
        "learning_map:\n  0: 0\n  10: 2\n  30: 1\n  40: 3\n"
    )
    mapping = sk.load_learning_map(str(yaml_path))
    assert mapping == {0: 0, 10: 2, 30: 1, 40: 3}

    # tiny raw tree: one scan, labels using raw ids 10/30/40
    seq = tmp_path / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    pts = np.random.RandomState(0).randn(32, 4).astype(np.float32)
    pts.tofile(seq / "velodyne" / "000000.bin")
    raw = np.array([10] * 16 + [30] * 8 + [40] * 8, np.uint32)
    raw.tofile(seq / "labels" / "000000.label")

    ds = sk.SemanticKITTIScans(
        str(tmp_path), split="train", num_point=32,
        label_map_yaml=str(yaml_path),
    )
    _, lbl = ds[0]
    # remapped ids only (custom map), counts preserved under shuffling
    assert sorted(np.unique(lbl)) == [1, 2, 3]
    assert (lbl == 2).sum() == 16 and (lbl == 1).sum() == 8

    ds_default = sk.SemanticKITTIScans(str(tmp_path), split="train",
                                       num_point=32)
    _, lbl_d = ds_default[0]  # standard map: 10->1, 30->6, 40->9
    assert sorted(np.unique(lbl_d)) == [1, 6, 9]


def test_vectorized_augment_matches_original_loops():
    """Round-5 vectorization of the per-cloud rotate/dropout loops must be
    RNG-STREAM and VALUE identical to the original implementations (the
    recorded convergence probes depend on the exact stream). The original
    per-cloud loops are inlined here as the reference."""
    from pointnet12_tpu.data import augment as aug

    batch = np.random.RandomState(42).randn(6, 128, 9).astype(np.float32)

    def ref_rotate(batch, rng, axis):
        out = batch.copy()
        for b in range(batch.shape[0]):
            angle = rng.uniform() * 2 * np.pi
            c, s = np.cos(angle), np.sin(angle)
            if axis == "y":
                rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                               dtype=batch.dtype)
            else:
                rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                               dtype=batch.dtype)
            out[b, :, :3] = batch[b, :, :3] @ rot
        return out

    def ref_perturb(batch, rng, angle_sigma=0.06, angle_clip=0.18):
        out = batch.copy()
        for b in range(batch.shape[0]):
            a = np.clip(angle_sigma * rng.randn(3), -angle_clip, angle_clip)
            cx, sx = np.cos(a[0]), np.sin(a[0])
            cy, sy = np.cos(a[1]), np.sin(a[1])
            cz, sz = np.cos(a[2]), np.sin(a[2])
            rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            rot = (rz @ ry @ rx).astype(batch.dtype)
            out[b, :, :3] = batch[b, :, :3] @ rot
        return out

    def ref_dropout(batch, rng, max_dropout_ratio=0.875):
        out = batch.copy()
        for b in range(batch.shape[0]):
            ratio = rng.uniform() * max_dropout_ratio
            drop = np.where(rng.uniform(size=batch.shape[1]) <= ratio)[0]
            if len(drop) > 0:
                out[b, drop, :] = out[b, 0, :]
        return out

    cases = [
        (aug.rotate_point_cloud, lambda b, r: ref_rotate(b, r, "y")),
        (aug.rotate_point_cloud_z, lambda b, r: ref_rotate(b, r, "z")),
        (aug.rotate_perturbation_point_cloud, ref_perturb),
        (aug.random_point_dropout, ref_dropout),
    ]
    for new_fn, ref_fn in cases:
        r_new = np.random.RandomState(7)
        r_ref = np.random.RandomState(7)
        got = new_fn(batch, rng=r_new)
        exp = ref_fn(batch, r_ref)
        np.testing.assert_allclose(got, exp, atol=1e-6, err_msg=new_fn.__name__)
        # identical post-call rng state => the downstream stream (jitter,
        # next batch) is untouched
        s_new, s_ref = r_new.get_state(), r_ref.get_state()
        assert s_new[0] == s_ref[0] and np.array_equal(s_new[1], s_ref[1])
        assert s_new[2:] == s_ref[2:], new_fn.__name__


def test_synthetic_cache_matches_regeneration():
    """The materialize-on-first-access cache must return the same arrays
    as fresh regeneration (pure function of the index)."""
    from pointnet12_tpu.data.synthetic import SyntheticModelNet, SyntheticScene

    for cls, kw in ((SyntheticModelNet, dict(num_point=64, size=8)),
                    (SyntheticScene, dict(num_point=128, size=4))):
        a, b = cls("train", **kw), cls("train", **kw)
        p1, l1 = a[2]
        p1b, l1b = a[2]  # cached hit
        p2, l2 = b._make(2)  # fresh regeneration, no cache
        assert np.array_equal(p1, p2) and np.array_equal(p1, p1b)
        assert np.array_equal(np.asarray(l1), np.asarray(l2))


def test_fast_rng_generator_path():
    """Feeder(fast_rng=True) drives the augments with a np.random.Generator:
    deterministic per epoch, same shapes/dtype/invariants as the RandomState
    path (a DIFFERENT stream by design — see data/loader.py)."""
    ds = SyntheticScene("train", num_point=128, num_classes=5, size=8)
    mk = lambda: Feeder(ds, 4, shuffle=True, prefetch=False,
                        augment_fn=augment.segmentation_augment,
                        fast_rng=True, seed=3)
    b1, b2 = (list(mk()) for _ in range(2))
    for x, y in zip(b1, b2):  # deterministic across fresh feeders
        assert np.array_equal(x["points"], y["points"])
        assert np.array_equal(x["label"], y["label"])
    slow = list(Feeder(ds, 4, shuffle=True, prefetch=False,
                       augment_fn=augment.segmentation_augment, seed=3))
    assert b1[0]["points"].shape == slow[0]["points"].shape
    assert b1[0]["points"].dtype == slow[0]["points"].dtype
    assert not np.array_equal(b1[0]["points"], slow[0]["points"])

    # every augment fn accepts a Generator; seg/perturb touch xyz only
    # (classification's dropout replaces WHOLE points with the first point)
    gen = np.random.Generator(np.random.PCG64(0))
    batch = np.random.RandomState(1).rand(4, 64, 9).astype(np.float32)
    for fn in (augment.classification_augment, augment.segmentation_augment,
               augment.rotate_perturbation_point_cloud):
        out = fn(batch, rng=gen)
        assert out.shape == batch.shape and out.dtype == batch.dtype
        if fn is not augment.classification_augment:
            assert np.array_equal(out[..., 3:], batch[..., 3:])
