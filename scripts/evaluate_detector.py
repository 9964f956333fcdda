#!/usr/bin/env python
"""Detector evaluation CLI — the vendored evaluate.py driver.

Rebuild of corner_net_lite/evaluate.py:16-103 + the dataset-eval drive in
core/test/cornernet.py:27-73 (and the saccade drive,
core/test/cornernet_saccade.py): iterate a COCO-format split, run the
full multi-scale / flip-TTA (or two-stage saccade) inference per image,
write COCO ``results.json``, and run the official COCOeval protocol.

The reference resolves its split from baked-in COCO paths
(core/dbs/coco.py); this CLI takes the annotation file + image dir
explicitly since no COCO data ships in either repo. Snapshots are the
Orbax directories written by scripts/train_detector.py
(``<snapshot_dir>/<cfg>_<iter>``), selected with --testiter like the
reference's ``nnet.load_params(test_iter)`` (evaluate.py:50-57).

Example:
    python scripts/evaluate_detector.py CornerNet_Squeeze \
        --annotations data/coco/annotations/instances_val.json \
        --image-dir data/coco/val --snapshot-dir cache/nnet --testiter 500000
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def read_args():
    parser = argparse.ArgumentParser(description="Evaluation Script")
    parser.add_argument("cfg_file", help="config name (evaluate.py:18-20)",
                        choices=["CornerNet", "CornerNet_Squeeze", "CornerNet_Saccade"])
    parser.add_argument("--annotations", required=True,
                        help="COCO-format annotation JSON for the split.")
    parser.add_argument("--image-dir", required=True,
                        help="Directory holding the split's images.")
    parser.add_argument("--testiter", default=None, type=int,
                        help="test at iteration i (evaluate.py:19-21); "
                        "defaults to the config's max_iter")
    parser.add_argument("--split", default="validation",
                        help="split name, used for the result dir layout only")
    parser.add_argument("--suffix", default=None, type=str)
    parser.add_argument("--snapshot-dir", default="cache/nnet",
                        help="Where train_detector.py wrote snapshots.")
    parser.add_argument("--result-dir", default="results")
    parser.add_argument("--random", action="store_true",
                        help="Random weights (protocol smoke test; no snapshot).")
    parser.add_argument("--tiny", action="store_true",
                        help="Shrink the model + input contract for protocol "
                        "smoke tests on hosts where the full-geometry compile "
                        "is minutes (not in the reference).")
    parser.add_argument("--debug", action="store_true",
                        help="First 100 images only + bbox overlays "
                        "(core/test/cornernet.py:33-62)")
    parser.add_argument("--max-images", default=None, type=int,
                        help="Cap evaluated images (not in the reference; "
                        "useful on synthetic sets).")
    return parser.parse_args()


def main():
    flags = read_args()
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from object_keypoints_tpu.data.coco import CocoDetectionDataset
    from object_keypoints_tpu.inference.detector import cornernet_inference
    from object_keypoints_tpu.models.cornernet import (
        cornernet,
        cornernet_saccade,
        cornernet_squeeze,
    )
    from object_keypoints_tpu.utils.config import (
        DetectionConfig,
        SystemConfig,
        load_cfg,
    )
    from object_keypoints_tpu.utils.progress import Timer, stdout_to_tqdm
    from object_keypoints_tpu.utils.vis import draw_bboxes

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "object_keypoints_tpu", "configs",
        flags.cfg_file + ".json",
    )
    sys_cfg_json, db_cfg = load_cfg(cfg_path)
    system_config = SystemConfig(
        **{"snapshot_name": flags.cfg_file}).update_config(sys_cfg_json)
    if flags.tiny:
        from object_keypoints_tpu.utils.config import tiny_db_overrides

        db_cfg = dict(db_cfg, **tiny_db_overrides(flags.cfg_file))
    config = DetectionConfig(db_cfg)

    # result dir layout parity: <result_dir>/<testiter>/<split>[/<suffix>]
    # (evaluate.py:42-48)
    test_iter = flags.testiter if flags.testiter is not None else system_config.max_iter
    result_dir = os.path.join(flags.result_dir, str(test_iter), flags.split)
    if flags.suffix is not None:
        result_dir = os.path.join(result_dir, flags.suffix)
    os.makedirs(result_dir, exist_ok=True)

    db = CocoDetectionDataset(flags.annotations, flags.image_dir)
    categories = config["categories"]

    if flags.tiny:
        from object_keypoints_tpu.models.cornernet import tiny_cornernet

        model = tiny_cornernet(flags.cfg_file, categories=categories)
    else:
        factory = {"CornerNet": cornernet, "CornerNet_Squeeze": cornernet_squeeze,
                   "CornerNet_Saccade": cornernet_saccade}[flags.cfg_file]
        model = factory(categories=categories, dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, config["input_size"][0], config["input_size"][1], 3),
                      model.dtype)
    variables = model.init({"params": jax.random.key(0)}, dummy)
    if flags.random:
        pass
    else:
        import orbax.checkpoint as ocp

        name = (system_config.snapshot_name or "model") + f"_{test_iter}"
        snapshot = os.path.abspath(os.path.join(flags.snapshot_dir, name))
        print(f"loading parameters at iteration: {test_iter}")
        restored = ocp.PyTreeCheckpointer().restore(snapshot)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}

    if flags.cfg_file == "CornerNet_Saccade":
        from object_keypoints_tpu.inference.saccade import (
            cornernet_saccade_inference,
            make_saccade_decode_fn_fused,
        )

        decode_fn = make_saccade_decode_fn_fused(model, variables, config)
        infer = lambda image: cornernet_saccade_inference(config, decode_fn, image)
    else:
        import functools

        @functools.partial(
            jax.jit, static_argnames=("K", "ae_threshold", "kernel", "num_dets"))
        def decode_fn(images, K, ae_threshold, kernel, num_dets):
            out = model.apply(
                variables, images, False, True,
                K=K, ae_threshold=ae_threshold, kernel=kernel, num_dets=num_dets,
            )
            return out[0]

        infer = lambda image: cornernet_inference(config, decode_fn, image)

    db_inds = db.db_inds[:100] if flags.debug else db.db_inds
    if flags.max_images is not None:
        db_inds = db_inds[:flags.max_images]

    debug_dir = os.path.join(result_dir, "debug")
    if flags.debug:
        os.makedirs(debug_dir, exist_ok=True)

    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        tqdm = lambda it, **kw: it

    timer = Timer()
    top_bboxes = {}
    with stdout_to_tqdm():
        for ind in tqdm(range(len(db_inds)), ncols=80, desc="locating kps"):
            db_ind = int(db_inds[ind])
            image_id = db.image_ids[db_ind]
            image = cv2.imread(db.image_path(db_ind))
            assert image is not None, db.image_path(db_ind)

            timer.tic()
            top_bboxes[image_id] = infer(image[..., ::-1])
            timer.toc()

            if flags.debug:
                named = {
                    db.class_names.get(j, str(j)): top_bboxes[image_id][j]
                    for j in range(1, categories + 1)
                    if j in top_bboxes[image_id]
                }
                overlay = draw_bboxes(image, named)
                cv2.imwrite(os.path.join(debug_dir, f"{db_ind}.jpg"), overlay)
    print(f"average time: {timer.average_time}")

    result_json = os.path.join(result_dir, "results.json")
    detections = db.convert_to_coco(top_bboxes)
    with open(result_json, "w") as f:
        json.dump(detections, f)

    cls_ids = list(range(1, categories + 1))
    image_ids = [db.image_ids[int(i)] for i in db_inds]
    out = db.evaluate(result_json, cls_ids, image_ids)
    print(json.dumps({"mAP": out["mAP"], "images": len(image_ids),
                      "avg_time_s": timer.average_time}))
    return out


if __name__ == "__main__":
    main()
