"""Labeling-core tests: frame-pair selection, two-view triangulation
accuracy, undo/save flow (reference scripts/label.py semantics)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from object_keypoints_tpu.data.synthetic import write_synthetic_sequence
from object_keypoints_tpu.geometry import from_calibration, linalg
from object_keypoints_tpu.labeling import (
    LabelingSession,
    find_furthest_frames,
    read_points,
    triangulate_pair,
    write_points,
)


@pytest.fixture(scope="module")
def sequence_dir(tmp_path_factory, calibration_file):
    out = tmp_path_factory.mktemp("label_seq") / "seq"
    write_synthetic_sequence(
        str(out), calibration_file, keypoint_config=[1, 3], n_frames=24,
        orbit_radius=0.5, seed=7,
    )
    return str(out)


class TestFindFurthest:
    def test_skips_close_baselines(self):
        poses = np.stack([np.eye(4)] * 10)  # zero baseline everywhere
        assert find_furthest_frames(poses) == (None, None)

    def test_picks_orthogonal_views(self):
        def pose(angle, radius=1.0):
            T = np.eye(4)
            c, s = np.cos(angle), np.sin(angle)
            T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            T[:3, 3] = [radius * np.sin(angle), 0, radius * (1 - np.cos(angle))]
            return T

        poses = np.stack([pose(a) for a in np.linspace(0, np.pi / 2, 12)])
        i, j = find_furthest_frames(poses, stride=1)
        # the most orthogonal pair is (first, last)
        assert (i, j) == (0, 11)


class TestTriangulation:
    def test_two_frame_triangulation_recovers_world_point(self, sequence_dir,
                                                          calibration_file):
        import h5py

        camera = from_calibration(calibration_file)
        with h5py.File(os.path.join(sequence_dir, "data.hdf5"), "r") as f:
            poses = f["camera_transform"][:]
        world = read_points(os.path.join(sequence_dir, "keypoints.json"))[:, :3]

        i, j = find_furthest_frames(poses, min_baseline=0.05)
        assert i is not None
        T_WL, T_WR = poses[i], poses[j]
        for X in world:
            left = camera.project(X[None], np.asarray(linalg.inv_transform(T_WL)))[0]
            right = camera.project(X[None], np.asarray(linalg.inv_transform(T_WR)))[0]
            recon = triangulate_pair(camera, T_WL, T_WR, left, right)
            assert np.linalg.norm(recon - X) < 1e-3


class TestSession:
    def test_click_undo_save_roundtrip(self, sequence_dir, calibration_file):
        import h5py

        session = LabelingSession(sequence_dir, calibration_file)
        assert session.left_frame_index is not None

        camera = session.camera
        with h5py.File(os.path.join(sequence_dir, "data.hdf5"), "r") as f:
            poses = f["camera_transform"][:]
        world = read_points(os.path.join(sequence_dir, "keypoints.json"))[:, :3]
        T_WL = poses[session.left_frame_index]
        T_WR = poses[session.right_frame_index]

        for X in world:
            session.add_point(
                "left", camera.project(X[None], np.asarray(linalg.inv_transform(T_WL)))[0]
            )
            session.add_point(
                "right", camera.project(X[None], np.asarray(linalg.inv_transform(T_WR)))[0]
            )
        # exercise undo: add a junk point and remove it
        session.add_point("left", (0.0, 0.0))
        session.undo()
        assert len(session.left_keypoints) == len(world)

        out_file = session.save()
        saved = read_points(out_file)
        assert saved.shape == world.shape
        np.testing.assert_allclose(saved, world, atol=2e-3)

        back = session.backproject(session.left_frame_index)
        assert back.shape == (len(world), 2)

    def test_mismatched_counts_assert(self, sequence_dir, calibration_file):
        session = LabelingSession(sequence_dir, calibration_file)
        session.add_point("left", (10.0, 10.0))
        with pytest.raises(AssertionError):
            session.save()

    def test_write_points_format(self, tmp_path):
        path = tmp_path / "keypoints.json"
        write_points(str(path), [np.array([1.0, 2.0, 3.0])])
        with open(path) as f:
            data = json.load(f)
        assert data == {"3d_points": [[1.0, 2.0, 3.0]]}
