"""Data layer tests: converters, reader, augs, wrappers, loaders."""

import json
import os
import tempfile

import numpy as np
import pytest

from glsdet_tpu.data.augment import (
    hsv_aug,
    letterbox,
    mixup,
    mosaic4,
    random_affine,
    random_flip,
)
from glsdet_tpu.data.coco import CocoDataset, normalize, pad_gts
from glsdet_tpu.data.loader import EvalPipeline, TrainPipeline, train_loader
from glsdet_tpu.data.uavdt import uavdt_to_coco
from glsdet_tpu.data.visdrone import parse_visdrone_txt, visdrone_to_coco
from glsdet_tpu.data.wrappers import (
    ClassBalancedDataset,
    ConcatDataset,
    RepeatDataset,
)


@pytest.fixture(scope="module")
def visdrone_dir():
    import cv2

    root = tempfile.mkdtemp()
    os.makedirs(f"{root}/images")
    os.makedirs(f"{root}/annotations")
    rs = np.random.RandomState(0)
    for i in range(6):
        img = rs.randint(0, 255, (120, 160, 3), np.uint8)
        cv2.imwrite(f"{root}/images/{i:04d}.jpg", img)
        lines = [f"{10 + i},{10},{30},{20},1,{(i % 10) + 1},0,0",
                 "0,0,50,50,1,0,0,0"]
        open(f"{root}/annotations/{i:04d}.txt", "w").write("\n".join(lines))
    visdrone_to_coco(root, f"{root}/train.json")
    return root


class TestConverters:
    def test_visdrone_parse_drops_ignore_and_others(self, tmp_path):
        p = tmp_path / "a.txt"
        p.write_text("1,2,3,4,1,5,0,0\n0,0,9,9,1,0,0,0\n5,5,5,5,1,11,0,0\n")
        boxes, labels, ignores = parse_visdrone_txt(str(p))
        assert len(boxes) == 1 and labels == [5]
        assert len(ignores) == 1

    def test_visdrone_to_coco(self, visdrone_dir):
        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        assert len(ds) == 6
        assert len(ds.class_names) == 10
        assert len(ds.ignore_regions) == 6  # one per image
        rec = ds.records[0]
        # xywh converted to xyxy
        np.testing.assert_allclose(rec.boxes[0], [10, 10, 40, 30])

    def test_uavdt_to_coco(self, tmp_path):
        gt = tmp_path / "GT"
        gt.mkdir()
        (gt / "M0101_gt_whole.txt").write_text(
            "1,1,10,20,30,40,0,0,1\n1,2,50,60,20,20,0,0,3\n"
            "2,1,12,22,30,40,0,0,1\n")
        (gt / "M0203_gt_whole.txt").write_text("1,1,5,5,10,10,0,0,2\n")
        coco = uavdt_to_coco(str(tmp_path), str(tmp_path / "train.json"),
                             split="train")
        assert len(coco["images"]) == 2  # M0101 frames 1, 2
        assert len(coco["annotations"]) == 3
        coco_t = uavdt_to_coco(str(tmp_path), str(tmp_path / "test.json"),
                               split="test")
        assert len(coco_t["images"]) == 1  # M0203 is a test sequence


class TestAugs:
    def test_letterbox_box_transform(self):
        img = np.zeros((100, 200, 3), np.uint8)
        boxes = np.array([[0.0, 0, 200, 100]])
        out, b, scale, (dx, dy) = letterbox(img, boxes, (128, 128))
        assert out.shape == (128, 128, 3)
        np.testing.assert_allclose(scale, 0.64)
        np.testing.assert_allclose(b[0], [0, dy, 128, dy + 64])

    def test_mosaic_output_shape_and_clipping(self):
        rs = np.random.RandomState(0)
        imgs = [np.full((60, 80, 3), i * 50, np.uint8) for i in range(4)]
        boxes = [np.array([[5.0, 5, 30, 30]])] * 4
        labels = [np.array([1])] * 4
        canvas, b, l = mosaic4(imgs, boxes, labels, (64, 64), rs)
        assert canvas.shape == (128, 128, 3)
        assert (b[:, 2] <= 128).all() and (b[:, 3] <= 128).all()

    def test_random_affine_keeps_valid_boxes(self):
        rs = np.random.RandomState(1)
        img = np.zeros((128, 128, 3), np.uint8)
        boxes = np.array([[30.0, 30, 80, 80]])
        out, b, l = random_affine(img, boxes, np.array([0]), rs, (64, 64))
        assert out.shape == (64, 64, 3)

    def test_flip_box_mirror(self):
        img = np.zeros((10, 100, 3), np.uint8)
        boxes = np.array([[10.0, 0, 30, 10]])
        rs = np.random.RandomState(0)
        out, b = random_flip(img, boxes, rs, prob=1.0)
        np.testing.assert_allclose(b[0], [70, 0, 90, 10])

    def test_hsv_preserves_shape_dtype(self):
        rs = np.random.RandomState(0)
        img = rs.randint(0, 255, (32, 32, 3), np.uint8)
        out = hsv_aug(img, rs)
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_mixup_concats_gts(self):
        rs = np.random.RandomState(0)
        a = np.zeros((32, 32, 3), np.uint8)
        out, b, l = mixup(a, np.zeros((1, 4)), np.array([0]),
                          a, np.ones((2, 4)), np.array([1, 1]), rs)
        assert len(b) == 3 and len(l) == 3


class TestPipelines:
    def test_train_pipeline_fixed_shapes(self, visdrone_dir):
        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        pipe = TrainPipeline(ds, (96, 96), max_gt=20)
        s = pipe(0, np.random.RandomState(0))
        assert s["images"].shape == (96, 96, 3)
        assert s["gt_boxes"].shape == (20, 4)
        assert s["gt_valid"].dtype == bool

    def test_train_loader_batches(self, visdrone_dir):
        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        pipe = TrainPipeline(ds, (96, 96), max_gt=10, mosaic=False,
                             enable_mixup=False, hsv=False)
        it = train_loader(pipe, batch_size=2, num_threads=2)
        b = next(it)
        assert b["images"].shape == (2, 96, 96, 3)
        assert b["gt_labels"].shape == (2, 10)

    def test_eval_pipeline_metadata(self, visdrone_dir):
        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        pipe = EvalPipeline(ds, (128, 128))
        s = pipe(0)
        assert s["images"].shape == (128, 128, 3)
        assert s["orig_hw"].tolist() == [120, 160]
        assert s["scale"] == pytest.approx(0.8)


class TestWrappers:
    def test_repeat(self, visdrone_dir):
        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        r = RepeatDataset(ds, 3)
        assert len(r) == 18
        assert r.load_image(r.records[0]).shape == (120, 160, 3)

    def test_concat(self, visdrone_dir):
        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        c = ConcatDataset([ds, ds])
        assert len(c) == 12

    def test_class_balanced_oversamples(self, visdrone_dir):
        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        cb = ClassBalancedDataset(ds, oversample_thr=0.5)
        assert len(cb) >= len(ds)


class TestGroupSampler:
    def _flags(self):
        # 7 landscape, 5 portrait
        return np.array([1] * 7 + [0] * 5, np.int64)

    def test_batches_single_group_full_coverage(self):
        from glsdet_tpu.data.loader import GroupSampler

        s = GroupSampler(self._flags(), batch_size=4, seed=3)
        batches = s.epoch_batches(0)
        flags = self._flags()
        seen = set()
        for b in batches:
            assert len(b) == 4
            assert len(set(flags[b])) == 1  # homogeneous batch
            seen.update(int(i) for i in b)
        assert seen == set(range(12))  # every index sampled >= once

    def test_deterministic_and_epoch_varying(self):
        from glsdet_tpu.data.loader import GroupSampler

        s = GroupSampler(self._flags(), batch_size=4, seed=3)
        a = [list(b) for b in s.epoch_batches(1)]
        b = [list(b) for b in s.epoch_batches(1)]
        c = [list(b) for b in s.epoch_batches(2)]
        assert a == b
        assert a != c

    def test_distributed_partition(self):
        from glsdet_tpu.data.loader import (DistributedGroupSampler,
                                            GroupSampler)

        flags = self._flags()
        world = 2
        per_rank = [DistributedGroupSampler(flags, 4, world, r, seed=0)
                    .epoch_batches(0) for r in range(world)]
        assert len(per_rank[0]) == len(per_rank[1])  # equal schedule
        global_b = GroupSampler(flags, 4, seed=0).epoch_batches(0)
        dealt = [tuple(b) for rb in per_rank for b in rb]
        assert set(dealt) >= {tuple(b) for b in global_b}

    def test_aspect_flags_from_dataset(self, visdrone_dir):
        from glsdet_tpu.data.loader import aspect_ratio_flags

        ds = CocoDataset(f"{visdrone_dir}/train.json",
                         f"{visdrone_dir}/images")
        flags = aspect_ratio_flags(ds)
        assert flags.shape == (len(ds),)
        assert set(np.unique(flags)) <= {0, 1}


class TestAutoAugment:
    def _sample(self):
        rs = np.random.RandomState(0)
        img = rs.randint(0, 255, (64, 96, 3), np.uint8)
        boxes = np.array([[10, 10, 40, 40], [50, 20, 90, 60]], np.float32)
        labels = np.array([1, 2], np.int64)
        return img, boxes, labels

    def test_policy_application_preserves_invariants(self):
        from glsdet_tpu.data.augment import auto_augment

        img, boxes, labels = self._sample()
        for seed in range(8):
            out, b, l = auto_augment(img, boxes, labels,
                                     np.random.RandomState(seed))
            assert out.shape == img.shape and out.dtype == np.uint8
            assert len(b) == len(l)
            if len(b):
                assert (b[:, 0] <= b[:, 2]).all()
                assert b[:, [0, 2]].min() >= 0
                assert b[:, [0, 2]].max() <= 96
                assert b[:, [1, 3]].max() <= 64

    def test_translate_moves_boxes(self):
        from glsdet_tpu.data.augment import translate_aug

        img, boxes, labels = self._sample()
        out, b, l = translate_aug(img, boxes, labels,
                                  np.random.RandomState(1), level=2,
                                  prob=1.0, random_negative=False,
                                  max_translate_offset=100.0)
        # level 2 -> 20px right shift
        np.testing.assert_allclose(b[0], [30, 10, 60, 40], atol=1e-4)

    def test_rotate_90_symmetry(self):
        from glsdet_tpu.data.augment import rotate_aug

        img = np.zeros((64, 64, 3), np.uint8)
        boxes = np.array([[24, 24, 40, 40]], np.float32)  # centered box
        out, b, _ = rotate_aug(img, boxes, np.array([0]),
                               np.random.RandomState(0), level=10,
                               max_rotate_angle=90.0, prob=1.0,
                               random_negative=False)
        # a centered square rotated about the center stays centered
        np.testing.assert_allclose((b[0, 0] + b[0, 2]) / 2, 32, atol=0.6)
        np.testing.assert_allclose((b[0, 1] + b[0, 3]) / 2, 32, atol=0.6)

    def test_photometric_ops_shape_only(self):
        from glsdet_tpu.data.augment import (brightness_aug, color_aug,
                                             contrast_aug, equalize_aug)

        img, _, _ = self._sample()
        rng = np.random.RandomState(0)
        for fn in (lambda: color_aug(img, rng, 6, prob=1.0),
                   lambda: brightness_aug(img, rng, 6, prob=1.0),
                   lambda: contrast_aug(img, rng, 6, prob=1.0),
                   lambda: equalize_aug(img, rng, prob=1.0)):
            out = fn()
            assert out.shape == img.shape and out.dtype == np.uint8
