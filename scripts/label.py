#!/usr/bin/env python
"""Keypoint labeling CLI — reference scripts/label.py.

The reference is a hud/OpenGL click GUI; this environment is headless, so
the frontend is matplotlib's event loop when a display exists, and the
fully-tested math (frame-pair selection, two-view triangulation, undo,
saving) lives in object_keypoints_tpu.labeling either way.

Keys (GUI mode): click left pane then right pane alternately; u = undo,
s = triangulate + save + show backprojections, q/tab = next sequence.
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("base_dir", help="Directory with encoded sequence directories.")
    parser.add_argument("--calibration", type=str, default=None,
                        help="Kalibr calibration (defaults to the sequence's).")
    return parser.parse_args()


def _read_frame(sequence_dir, index):
    import cv2

    path = os.path.join(sequence_dir, "frames_preview.mp4")
    if not os.path.exists(path):
        path = os.path.join(sequence_dir, "frames.mp4")
    capture = cv2.VideoCapture(path)
    capture.set(cv2.CAP_PROP_POS_FRAMES, index)
    ok, frame = capture.read()
    capture.release()
    if not ok:
        raise RuntimeError(f"could not read frame {index} of {path}")
    return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)


def label_sequence_gui(sequence_dir, calibration):
    from matplotlib import pyplot

    from object_keypoints_tpu.labeling import LabelingSession

    session = LabelingSession(sequence_dir, calibration)
    left = _read_frame(sequence_dir, session.left_frame_index)
    right = _read_frame(sequence_dir, session.right_frame_index)

    fig, (ax_l, ax_r) = pyplot.subplots(1, 2, figsize=(16, 6))
    ax_l.imshow(left)
    ax_r.imshow(right)
    ax_l.set_title("left frame — click keypoints")
    ax_r.set_title("right frame — click matching keypoints")

    def redraw():
        for ax, pts in ((ax_l, session.left_keypoints), (ax_r, session.right_keypoints)):
            for artist in list(ax.lines):
                artist.remove()
            for p in pts:
                ax.plot(p[0], p[1], "r+", markersize=12)
        fig.canvas.draw_idle()

    def on_click(event):
        if event.inaxes is ax_l:
            session.add_point("left", (event.xdata, event.ydata))
        elif event.inaxes is ax_r:
            session.add_point("right", (event.xdata, event.ydata))
        redraw()

    def on_key(event):
        if event.key == "u":
            session.undo()
            redraw()
        elif event.key == "s":
            out = session.save()
            print(f"saved {out}")
            back_l = session.backproject(session.left_frame_index)
            back_r = session.backproject(session.right_frame_index)
            ax_l.scatter(back_l[:, 0], back_l[:, 1], c="b", marker="x")
            ax_r.scatter(back_r[:, 0], back_r[:, 1], c="b", marker="x")
            fig.canvas.draw_idle()
        elif event.key in ("q", "tab"):
            pyplot.close(fig)

    fig.canvas.mpl_connect("button_press_event", on_click)
    fig.canvas.mpl_connect("key_press_event", on_key)
    pyplot.show()


def main():
    flags = read_args()
    import matplotlib

    if not os.environ.get("DISPLAY") and matplotlib.get_backend().lower() in (
        "agg", "template",
    ):
        raise SystemExit(
            "label.py needs an interactive display. Headless labeling is "
            "available programmatically via object_keypoints_tpu.labeling."
            "LabelingSession (add_point/undo/save are fully tested)."
        )
    sequences = sorted(
        os.path.join(flags.base_dir, d) for d in os.listdir(flags.base_dir)
    )
    for seq in sequences:
        print(f"labeling {seq}")
        label_sequence_gui(seq, flags.calibration)


if __name__ == "__main__":
    main()
