"""Detection augmentation tests (sampler-utility parity)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from object_keypoints_tpu.data.detection_augment import (
    _get_border,
    clip_detections,
    color_jitter,
    lighting,
    random_crop,
    resize_image,
)


class TestRandomCrop:
    def test_border_shrinks_for_small_images(self):
        assert _get_border(64, 512) == 64
        assert _get_border(64, 100) == 32
        assert _get_border(128, 100) == 32

    def test_crop_keeps_detection_geometry(self):
        rng = np.random.default_rng(0)
        img = np.zeros((240, 320, 3), np.uint8)
        img[100:120, 150:170] = 255  # a bright box
        dets = np.array([[150.0, 100.0, 170.0, 120.0, 1.0]])
        cropped, out = random_crop(img, dets, [1.0], (128, 128), border=32, rng=rng)
        assert cropped.shape == (128, 128, 3)
        # wherever the box landed, the remapped coords must cover the bright
        # pixels if any are visible
        x0, y0, x1, y1 = out[0, :4].astype(int)
        # only check when the remapped box actually intersects the crop
        cx0, cy0 = max(x0, 0), max(y0, 0)
        cx1, cy1 = min(x1, 128), min(y1, 128)
        if cx1 > cx0 and cy1 > cy0:
            assert cropped[cy0:cy1, cx0:cx1].max() == 255
        else:
            assert cropped.max() == 0  # box cropped away -> no bright pixels

    def test_resize_remaps(self):
        img = np.zeros((100, 200, 3), np.uint8)
        dets = np.array([[20.0, 10.0, 40.0, 30.0, 1.0]])
        out, rd = resize_image(img, dets, (50, 100))
        assert out.shape == (50, 100, 3)
        np.testing.assert_allclose(rd[0, :4], [10, 5, 20, 15])

    def test_clip_drops_degenerate(self):
        img = np.zeros((64, 64, 3), np.uint8)
        dets = np.array([
            [10, 10, 20, 20, 1.0],
            [-30, -30, -10, -10, 1.0],  # fully outside -> degenerate after clip
        ], np.float32)
        out = clip_detections(img, dets)
        assert out.shape[0] == 1


class TestColorOps:
    def test_color_jitter_changes_image(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0.2, 0.8, size=(32, 32, 3)).astype(np.float32)
        before = img.copy()
        out = color_jitter(img, rng)
        assert out.shape == before.shape
        assert not np.allclose(out, before)

    def test_lighting_shifts_channels(self):
        rng = np.random.default_rng(2)
        img = np.full((8, 8, 3), 0.5, np.float32)
        out = lighting(img, rng)
        assert out.shape == (8, 8, 3)
        # per-channel constant shift
        for c in range(3):
            assert np.allclose(out[..., c], out[0, 0, c])
