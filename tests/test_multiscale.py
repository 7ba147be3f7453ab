"""Multi-scale training (SyncRandomSizeHook analog).

The reference resizes the dataset output every interval after an NCCL
size broadcast from rank 0 (yolox-ufp/mmdet/core/hook/
sync_random_size_hook.py:52-72, sizes = 32-multiples).  The fixed-shape
design instead keeps the loader at one base size and compiles one train
step per target size that bilinear-resizes ON DEVICE and scales the gt
boxes (steps.py make_yolox_train_step resize_from); the per-step size
comes from a step-seeded hash every host evaluates identically
(parallel/mesh.py multiscale_size — zero communication).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.parallel.mesh import multiscale_size


class TestSchedule:
    def test_deterministic_and_diverse(self):
        sizes = (448, 512, 576, 640)
        seq = [multiscale_size(s, sizes, interval=10) for s in range(200)]
        # identical on every "host" (pure function of step)
        assert seq == [multiscale_size(s, sizes, 10) for s in range(200)]
        # changes only at interval boundaries
        for i, s in enumerate(seq):
            assert s == seq[(i // 10) * 10]
        # visits more than one size
        assert len(set(seq)) >= 3

    def test_values_come_from_list(self):
        sizes = (64, 96)
        assert {multiscale_size(s, sizes, 1) for s in range(50)} <= set(
            sizes)


class TestResizeStep:
    def test_resize_step_equals_presized(self):
        """A resize_from step on a base-size batch computes EXACTLY the
        program of a plain step on the device-resized batch with scaled
        boxes — pinning the box-scaling math."""
        from glsdet_tpu.models import YOLOXDetector
        from glsdet_tpu.train import (TrainState, make_yolox_train_step,
                                      yolox_sgd)

        model = YOLOXDetector(num_classes=3, phi="nano")
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, 64, 64, 3)), train=False)
        tx = yolox_sgd(lambda s: 0.01)

        rs = np.random.RandomState(0)
        imgs = jnp.asarray(
            rs.randint(0, 255, (2, 64, 64, 3)).astype(np.float32))
        boxes = jnp.asarray([[[8., 8., 40., 40.]]] * 2)
        batch = {"images": imgs, "gt_boxes": boxes,
                 "gt_labels": jnp.zeros((2, 1), jnp.int32),
                 "gt_valid": jnp.ones((2, 1), bool)}

        step_ms = jax.jit(make_yolox_train_step(
            model, tx, (96, 96), normalize=True, resize_from=(64, 64)))
        st1, m1 = step_ms(TrainState.create(variables, tx, rng), batch)

        resized = jax.image.resize(imgs, (2, 96, 96, 3), "bilinear")
        pre_batch = {"images": resized, "gt_boxes": boxes * 1.5,
                     "gt_labels": batch["gt_labels"],
                     "gt_valid": batch["gt_valid"]}
        step_plain = jax.jit(make_yolox_train_step(
            model, tx, (96, 96), normalize=True))
        st2, m2 = step_plain(TrainState.create(variables, tx, rng),
                             pre_batch)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            st1.params, st2.params)
        assert max(jax.tree.leaves(diffs)) < 1e-6

    def test_same_hw_is_noop(self):
        from glsdet_tpu.train.steps import make_yolox_train_step

        # resize_from == img_hw compiles the plain step (no resize op)
        fn = make_yolox_train_step(object(), None, (64, 64),
                                   resize_from=(64, 64))
        assert fn is not None  # factory itself must not resize/raise


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ms_data")
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
    def test_multiscale_training_run(self, tiny_coco, tmp_path):
        """The production loop trains across size hops with finite
        losses; interval=1 with 2 sizes guarantees both programs run."""
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
            "train.epochs": 2, "train.ckpt_interval": 5,
            "train.log_interval": 1, "train.num_last_epochs": 1,
            "train.multiscale_sizes": (64, 96),
            "train.multiscale_interval": 1,
            "train.work_dir": str(tmp_path / "wd")})
        state = train(cfg)
        assert int(state.step) == 4  # 2 epochs x 8/4 steps
        sched = [multiscale_size(s, (64, 96), 1) for s in range(4)]
        assert len(set(sched)) == 2  # both sizes actually trained

    def test_multiscale_rejects_mpdet_and_groups(self, tiny_coco,
                                                 tmp_path):
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
            "train.epochs": 1, "train.log_interval": 2,
            "train.multiscale_sizes": (64, 96),
            "train.steps_per_call": 2,
            "train.work_dir": str(tmp_path / "wd2")})
        with pytest.raises(ValueError, match="steps_per_call"):
            train(cfg)
