#!/usr/bin/env python
"""rosbag -> sequence-directory encoding — reference scripts/encode_bag.py.

The ROS-free writer core lives in data/encode.py (SequenceWriter); this CLI
adds the rosbag/tf2 ingestion (gated: requires a ROS environment) — per
image topic, look up the base->optical transform at the image timestamp,
skipping extrapolation failures (encode_bag.py:99-116), and stream frames +
poses to the writer."""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("bags", help="Directory containing .bag files.")
    parser.add_argument("--out", required=True, help="Output dataset directory.")
    parser.add_argument("--calibration", default="config/calibration.yaml")
    parser.add_argument("--topic", default="/zedm/zed_node/left_raw/image_raw_color")
    parser.add_argument("--base-frame", default="panda_link0")
    parser.add_argument("--optical-frame", default="zedm_left_camera_optical_frame")
    return parser.parse_args()


def encode_bag(bag_path, out_dir, calibration, topic, base_frame, optical_frame):
    import numpy as np
    import rosbag
    from tf2_py import BufferCore, ExtrapolationException
    import rospy

    from object_keypoints_tpu.data.encode import SequenceWriter
    from object_keypoints_tpu.utils.ros import message_to_transform

    bag = rosbag.Bag(bag_path)
    buffer = BufferCore(rospy.Duration(360000.0))
    for _, msg, _ in bag.read_messages(topics=["/tf", "/tf_static"]):
        for transform in msg.transforms:
            buffer.set_transform(transform, "bag")

    with SequenceWriter(out_dir) as writer:
        writer.write_calibration(calibration)
        for _, msg, _ in bag.read_messages(topics=[topic]):
            try:
                lookup = buffer.lookup_transform_core(
                    base_frame, optical_frame, msg.header.stamp
                )
            except ExtrapolationException:
                continue  # encode_bag.py:113-115
            T_WC = message_to_transform(lookup)
            image = np.frombuffer(msg.data, np.uint8).reshape(
                msg.height, msg.width, -1
            )[..., :3][..., ::-1]  # bgr(a) -> rgb
            writer.add_frame(np.ascontiguousarray(image), T_WC)
    bag.close()


def main():
    flags = read_args()
    try:
        import rosbag  # noqa: F401
    except ImportError:
        raise SystemExit(
            "encode_bag requires a ROS environment (rosbag/tf2_py). The "
            "writer core (object_keypoints_tpu.data.encode.SequenceWriter) "
            "is ROS-free and fully tested; only bag ingestion is gated."
        )
    bags = sorted(b for b in os.listdir(flags.bags) if b.endswith(".bag"))
    for i, bag_name in enumerate(bags):
        out_dir = os.path.join(flags.out, f"{i:03d}")
        encode_bag(
            os.path.join(flags.bags, bag_name), out_dir, flags.calibration,
            flags.topic, flags.base_frame, flags.optical_frame,
        )
        print(f"encoded {bag_name} -> {out_dir}")


if __name__ == "__main__":
    main()
