"""Iteration-based training (IterBasedRunner + InfiniteGroupBatchSampler
analog — yolox-ufp/mmdet/datasets/samplers/infinite_sampler.py:9 and the
runner selection in mmdet/apis/train.py)."""

import json

import numpy as np
import pytest

from glsdet_tpu.data.loader import InfiniteGroupBatchSampler


class TestSampler:
    def _flags(self):
        # 6 portrait (0), 10 landscape (1)
        return np.array([0] * 6 + [1] * 10, np.int64)

    def test_batches_single_group_and_endless(self):
        s = InfiniteGroupBatchSampler(self._flags(), batch_size=4, seed=0)
        flags = self._flags()
        it = iter(s)
        seen = []
        for _ in range(50):   # far beyond one dataset pass: never ends
            b = next(it)
            assert len(b) == 4
            assert len({int(flags[i]) for i in b}) == 1  # single group
            seen.extend(int(i) for i in b)
        assert set(seen) == set(range(16))  # asymptotic full coverage

    def test_rank_slicing_partitions_stream(self):
        """The N rank streams are the rank::N slices of ONE permutation
        stream (the reference's _indices_of_rank islice)."""
        flags = self._flags()
        whole = InfiniteGroupBatchSampler(flags, 2, seed=3)
        idx_stream = []
        rng = np.random.RandomState(3)
        for _ in range(4):
            idx_stream.extend(rng.permutation(16))
        for rank in range(2):
            s = InfiniteGroupBatchSampler(flags, 2, num_replicas=2,
                                          rank=rank, seed=3)
            want = idx_stream[rank::2]
            got = [int(i) for b in zip(range(8), iter(s)) for i in b[1]]
            # every yielded index appears in this rank's slice
            assert set(got) <= set(want)

    def test_deterministic(self):
        flags = self._flags()
        a = [list(map(int, b)) for _, b in zip(
            range(10), iter(InfiniteGroupBatchSampler(flags, 4, seed=7)))]
        b = [list(map(int, b)) for _, b in zip(
            range(10), iter(InfiniteGroupBatchSampler(flags, 4, seed=7)))]
        assert a == b

    def test_bad_rank(self):
        with pytest.raises(ValueError):
            InfiniteGroupBatchSampler(self._flags(), 2, num_replicas=2,
                                      rank=2)


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("iter_data")
    img_dir = root / "images"
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(8):
        img = rs.randint(0, 255, (64, 64, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i}.jpg",
                       "width": 64, "height": 64})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [8, 8, 24, 24], "area": 576, "iscrowd": 0})
    ann = root / "train.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "car"}]}))
    return str(ann), str(img_dir)


class TestLoop:
    def test_max_iters_trains_exact_budget(self, tiny_coco, tmp_path):
        """train.max_iters runs EXACTLY that many optimizer steps, past
        any epoch boundary (8 imgs / b4 = 2 steps per 'epoch', budget 5)
        with finite losses; epochs config is ignored."""
        from glsdet_tpu.config import apply_overrides, get_config
        from glsdet_tpu.train.loop import train

        ann, img_root = tiny_coco
        cfg = get_config("coarse_det")
        apply_overrides(cfg, {
            "model.phi": "nano", "model.dtype": "float32",
            "model.num_classes": 1,
            "data.ann_file": ann, "data.img_root": img_root,
            "data.img_hw": (64, 64), "data.batch_size": 4,
            "data.max_gt": 4, "data.mosaic": False, "data.mixup": False,
            "data.hsv": False, "data.flip_prob": 0.0,
            "data.num_workers": 2,
            "train.epochs": 1,          # ignored in iter mode
            "train.max_iters": 5,
            "train.ckpt_interval": 100, "train.log_interval": 1,
            "train.work_dir": str(tmp_path / "wd")})
        state = train(cfg)
        assert int(state.step) == 5
        log = [json.loads(line) for line in open(
            tmp_path / "wd" / "train.log.json")]
        assert [e["step"] for e in log] == [1, 2, 3, 4, 5]
        assert all(np.isfinite(e["loss"]) for e in log)

    def test_max_iters_rejects_two_phase_freeze(self, tiny_coco,
                                                tmp_path):
        """iter mode + the two-phase freeze recipe would give EACH phase
        the full max_iters budget — rejected up front."""
        from glsdet_tpu.config import apply_overrides, get_config
        from glsdet_tpu.train.loop import train

        ann, img_root = tiny_coco
        cfg = get_config("coarse_det")
        apply_overrides(cfg, {
            "model.phi": "nano", "model.dtype": "float32",
            "model.num_classes": 1,
            "data.ann_file": ann, "data.img_root": img_root,
            "data.img_hw": (64, 64), "data.batch_size": 4,
            "train.max_iters": 5, "train.freeze_epochs": 1,
            "train.work_dir": str(tmp_path / "wd2")})
        with pytest.raises(ValueError, match="max_iters"):
            train(cfg)
