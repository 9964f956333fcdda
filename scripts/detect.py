#!/usr/bin/env python
"""Detection demo CLI — the vendored demo.py + detector facades
(corner_net_lite/demo.py, core/detectors.py:6-49).

The reference loads pretrained COCO weights (not shipped in either repo);
this demo runs a named architecture with a given snapshot (or random init
with --random for smoke testing) on an image and writes the labeled
overlay.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("image", help="Input image path.")
    parser.add_argument("--arch", default="CornerNet_Squeeze",
                        choices=["CornerNet", "CornerNet_Squeeze", "CornerNet_Saccade"])
    parser.add_argument("--snapshot", default=None,
                        help="Orbax snapshot directory written by train_detector.py.")
    parser.add_argument("--random", action="store_true",
                        help="Random weights (pipeline smoke test).")
    parser.add_argument("--out", default="detections.jpg")
    return parser.parse_args()


def main():
    flags = read_args()
    import cv2
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.inference import Detector
    from object_keypoints_tpu.inference.saccade import cornernet_saccade_inference
    from object_keypoints_tpu.models.cornernet import (
        cornernet,
        cornernet_saccade,
        cornernet_squeeze,
    )
    from object_keypoints_tpu.utils.config import DetectionConfig, load_cfg
    from object_keypoints_tpu.utils.vis import draw_bboxes
    import os

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "object_keypoints_tpu", "configs",
        flags.arch + ".json",
    )
    _, db_cfg = load_cfg(cfg_path)
    config = DetectionConfig(db_cfg)

    factory = {"CornerNet": cornernet, "CornerNet_Squeeze": cornernet_squeeze,
               "CornerNet_Saccade": cornernet_saccade}[flags.arch]
    model = factory(categories=config["categories"], dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, config["input_size"][0], config["input_size"][1], 3),
                      jnp.bfloat16)
    variables = model.init({"params": jax.random.key(0)}, dummy)
    if flags.snapshot:
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(flags.snapshot))
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    elif not flags.random:
        raise SystemExit("provide --snapshot or pass --random for a smoke test")

    image = cv2.imread(flags.image)
    assert image is not None, flags.image

    if flags.arch == "CornerNet_Saccade":
        from object_keypoints_tpu.inference.saccade import (
            make_saccade_decode_fn_fused,
        )

        decode_fn = make_saccade_decode_fn_fused(model, variables, config)
        boxes = cornernet_saccade_inference(config, decode_fn, image[..., ::-1])
        named = {str(k): v for k, v in boxes.items()}
    else:
        detector = Detector(model, variables, config)
        named = detector(image[..., ::-1])

    overlay = draw_bboxes(image, named, thresh=0.3)
    cv2.imwrite(flags.out, overlay)
    n = sum(len(v[v[:, 4] > 0.3]) if len(v) else 0 for v in named.values())
    print(f"{n} detections above 0.3 -> {flags.out}")


if __name__ == "__main__":
    main()
