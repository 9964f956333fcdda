#!/usr/bin/env python
"""PnP / reprojection sanity harness — the reference keypoint_debug.ipynb
semantics: given a labeled sequence, solve PnP from the saved world
keypoints + their projections per frame, and compare the recovered pose to
the recorded camera transform."""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sequence", help="Labeled sequence directory.")
    parser.add_argument("--frames", type=int, default=5)
    flags = parser.parse_args()

    import cv2
    import h5py
    import numpy as np

    from object_keypoints_tpu.geometry import from_calibration, linalg
    from object_keypoints_tpu.labeling import read_points

    camera = from_calibration(os.path.join(flags.sequence, "calibration.yaml"))
    world = read_points(os.path.join(flags.sequence, "keypoints.json"))[:, :3]
    with h5py.File(os.path.join(flags.sequence, "data.hdf5"), "r") as f:
        poses = f["camera_transform"][:]

    for i in range(0, min(flags.frames, len(poses))):
        T_CW = np.asarray(linalg.inv_transform(poses[i]))
        projected = camera.project(world, T_CW)
        # undistort into pinhole coords for plain solvePnP
        und = camera.undistort(projected)
        method = cv2.SOLVEPNP_ITERATIVE if len(world) >= 6 else cv2.SOLVEPNP_SQPNP
        ok, rvec, tvec = cv2.solvePnP(
            world.astype(np.float64), und.astype(np.float64),
            camera.K, None, flags=method,
        )
        R, _ = cv2.Rodrigues(rvec)
        t_err = np.linalg.norm(tvec.ravel() - T_CW[:3, 3])
        r_err = np.degrees(
            np.arccos(np.clip((np.trace(R.T @ T_CW[:3, :3]) - 1) / 2, -1, 1))
        )
        reproj = camera.project(world, np.block([[R, tvec], [np.zeros((1, 3)), 1.0]]))
        px_err = np.linalg.norm(reproj - projected, axis=1).max()
        print(
            f"frame {i}: PnP translation err {t_err * 1000:.2f} mm, "
            f"rotation err {r_err:.4f} deg, max reprojection err {px_err:.4f} px"
        )


if __name__ == "__main__":
    main()
