"""Two-phase frozen-backbone training (yolox-drone train.py:196-262).

Phase 1 trains with backbone params frozen (requires_grad=False analog:
optax.multi_transform set_to_zero partition) at freeze_lr /
freeze_batch_size; phase 2 rebuilds a fresh optimizer and trains
unfrozen.  Checkpoint epoch numbering is continuous across phases.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.config import apply_overrides, get_config
from glsdet_tpu.train.loop import (build_optimizer, restore_raw, train)


def _flat(tree, prefix):
    from flax.traverse_util import flatten_dict

    return {k: np.asarray(v) for k, v in flatten_dict(tree).items()
            if k[0] == prefix}


def _diff(a, b):
    """Max |a-b| over the shared keys of two flattened sections."""
    return max(float(np.max(np.abs(a[k] - b[k]))) for k in a)


class TestFreezeMask:
    def test_frozen_backbone_step(self):
        """One real jitted train step under the frozen optimizer leaves
        every backbone param bit-identical while head params move."""
        from glsdet_tpu.train import TrainState, make_yolox_train_step

        cfg = get_config("coarse_det")
        apply_overrides(cfg, {"model.phi": "nano",
                              "model.dtype": "float32",
                              "model.num_classes": 3,
                              # warmup lr is 0 at step 0 (quadratic ramp)
                              # — zero it so one step moves the params
                              "train.warmup_epochs": 0})
        from glsdet_tpu.train.loop import build_model

        model = build_model(cfg)
        tx = build_optimizer(cfg, 10, frozen_sections=("backbone",))
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, 64, 64, 3)), train=False)
        state = TrainState.create(variables, tx, rng)
        step = jax.jit(make_yolox_train_step(
            model, tx, (64, 64), strides=(8, 16, 32)))
        batch = {
            "images": jnp.asarray(
                np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32),
            "gt_boxes": jnp.asarray([[[8, 8, 40, 40]]] * 2, jnp.float32),
            "gt_labels": jnp.zeros((2, 1), jnp.int32),
            "gt_valid": jnp.ones((2, 1), bool),
        }
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        before = jax.tree.map(np.asarray, variables["params"])
        after = jax.device_get(new_state.params)
        assert _diff(_flat(before, "backbone"),
                     _flat(after, "backbone")) == 0.0
        assert _diff(_flat(before, "head"), _flat(after, "head")) > 0


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("freeze_data")
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


class TestTwoPhase:
    def _cfg(self, tiny_coco, tmp_path, **over):
        ann, img_root = tiny_coco
        cfg = get_config("coarse_det")
        apply_overrides(cfg, {
            "model.phi": "nano", "model.dtype": "float32",
            "model.num_classes": 1,
            "data.ann_file": ann, "data.img_root": img_root,
            "data.img_hw": (64, 64), "data.batch_size": 8,
            "data.max_gt": 4, "data.mosaic": False, "data.mixup": False,
            "data.hsv": False, "data.flip_prob": 0.0,
            "data.num_workers": 2,
            "train.epochs": 2, "train.freeze_epochs": 1,
            "train.freeze_lr": 0.001, "train.freeze_batch_size": 4,
            "train.ckpt_interval": 1, "train.log_interval": 1,
            "train.work_dir": str(tmp_path / "wd"),
            **over})
        return cfg

    def test_two_phase_run(self, tiny_coco, tmp_path):
        cfg = self._cfg(tiny_coco, tmp_path)
        state = train(cfg)
        # phase 2 owns a fresh optimizer lifetime: 1 epoch x 1 step
        assert int(state.step) == 1

        # reproduce the loop's deterministic init (same seed/model) to
        # get the phase-1 baseline
        from glsdet_tpu.train.loop import build_model

        model = build_model(cfg)
        rng = jax.random.PRNGKey(cfg.train.seed)
        init = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=False)["params"]
        init = jax.tree.map(np.asarray, init)

        # epoch numbering is continuous across phases
        e1 = restore_raw(str(tmp_path / "wd" / "epoch_1"))["params"]
        e2 = restore_raw(str(tmp_path / "wd" / "epoch_2"))["params"]

        # phase 1 (epoch_1): backbone frozen at init, head trained
        assert _diff(_flat(init, "backbone"),
                     _flat(e1, "backbone")) == 0.0
        assert _diff(_flat(init, "head"), _flat(e1, "head")) > 0
        # phase 2 (epoch_2): backbone unfrozen and moving
        assert _diff(_flat(e1, "backbone"), _flat(e2, "backbone")) > 0

    def test_resume_with_freeze_rejected(self, tiny_coco, tmp_path):
        cfg = self._cfg(tiny_coco, tmp_path,
                        **{"train.resume": "some/ckpt"})
        with pytest.raises(ValueError, match="resume"):
            train(cfg)

    def test_freeze_epochs_bounds(self, tiny_coco, tmp_path):
        cfg = self._cfg(tiny_coco, tmp_path,
                        **{"train.freeze_epochs": 2})
        with pytest.raises(ValueError, match="freeze_epochs"):
            train(cfg)
