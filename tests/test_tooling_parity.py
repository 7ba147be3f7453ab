"""Tooling-sweep parity: publish_model / format_converter / images2coco
/ draw_bbox / dist-launch analogs.

References: ``yolox-ufp/tools/model_converters/publish_model.py``,
``yolox-ufp/tools/dataset_converters/images2coco.py``,
``yolox-drone/tools/basetools/{format_converter,init_datasets,
draw_bbox,txt_visual}.py``, ``yolox-ufp/tools/dist_train.sh``.
"""

import argparse
import importlib.util
import json
import os

import numpy as np

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_coco():
    return {
        "images": [{"id": 1, "file_name": "a.jpg",
                    "width": 32, "height": 24},
                   {"id": 2, "file_name": "b.jpg",
                    "width": 16, "height": 16}],
        "categories": [{"id": 1, "name": "car"},
                       {"id": 2, "name": "person"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [2, 3, 10, 8], "area": 80, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [5, 5, 4, 6], "area": 24, "iscrowd": 0},
        ],
    }


class TestCocoVocRoundTrip:
    def test_round_trip(self, tmp_path):
        from glsdet_tpu.data.voc import coco_to_voc, voc_to_coco

        coco = _tiny_coco()
        n = coco_to_voc(coco, str(tmp_path), split="train")
        assert n == 2
        root = tmp_path / "VOC2007"
        assert (root / "Annotations" / "a.xml").exists()
        assert (root / "JPEGImages").is_dir()
        ids = (root / "ImageSets" / "Main" / "train.txt"
               ).read_text().split()
        assert ids == ["a", "b"]

        back = voc_to_coco(str(root), "", ["car", "person"],
                           split="train")
        assert len(back["images"]) == 2
        anns = sorted(back["annotations"], key=lambda a: a["id"])
        assert [a["category_id"] for a in anns] == [1, 2]
        np.testing.assert_allclose(anns[0]["bbox"], [2, 3, 10, 8])
        np.testing.assert_allclose(anns[1]["bbox"], [5, 5, 4, 6])
        # sizes survive the xml round trip
        assert back["images"][0]["width"] == 32
        assert back["images"][0]["height"] == 24

    def test_iscrowd_marked_difficult(self, tmp_path):
        from glsdet_tpu.data.voc import coco_to_voc, voc_to_coco

        coco = _tiny_coco()
        coco["annotations"][1]["iscrowd"] = 1
        coco_to_voc(coco, str(tmp_path))
        back = voc_to_coco(str(tmp_path / "VOC2007"), "",
                           ["car", "person"])
        # difficult objects are skipped on the way back (reference
        # voc_annotation.py behavior)
        assert len(back["annotations"]) == 1


class TestImagesToCoco:
    def test_sizes_and_order(self, tmp_path):
        import cv2

        from glsdet_tpu.data.coco import images_to_coco

        cv2.imwrite(str(tmp_path / "b.png"),
                    np.zeros((12, 20, 3), np.uint8))
        cv2.imwrite(str(tmp_path / "a.jpg"),
                    np.zeros((8, 10, 3), np.uint8))
        (tmp_path / "notes.txt").write_text("not an image")

        out = tmp_path / "out" / "ann.json"
        coco = images_to_coco(str(tmp_path), str(out), ["car"])
        assert [im["file_name"] for im in coco["images"]] == \
            ["a.jpg", "b.png"]
        assert (coco["images"][0]["width"],
                coco["images"][0]["height"]) == (10, 8)
        assert (coco["images"][1]["width"],
                coco["images"][1]["height"]) == (20, 12)
        assert coco["annotations"] == []
        assert json.load(open(out))["categories"][0]["name"] == "car"


class TestDrawBBox:
    def test_txt_and_coco_iterators(self, tmp_path):
        mod = _load("draw_bbox")
        d = tmp_path / "dets"
        d.mkdir()
        (d / "img1.txt").write_text(
            "car 0.9 1 2 11 12\nperson 0.4 3 4 13 14\n")
        items = list(mod._iter_txt(str(d), prob=True, img_ext=".jpg"))
        (fname, boxes, scores, labels, names), = items
        assert fname == "img1.jpg"
        np.testing.assert_allclose(boxes[0], [1, 2, 11, 12])
        np.testing.assert_allclose(scores, [0.9, 0.4])
        assert names == ["car", "person"]

        # GT format (txt_visual.py --prob off): no confidence column
        (d / "img1.txt").write_text("car 1 2 11 12\n")
        (_, boxes, scores, _, _), = list(
            mod._iter_txt(str(d), prob=False, img_ext=".jpg"))
        np.testing.assert_allclose(boxes[0], [1, 2, 11, 12])
        np.testing.assert_allclose(scores, [1.0])

        ann = tmp_path / "ann.json"
        ann.write_text(json.dumps(_tiny_coco()))
        items = {f: (b, l) for f, b, _, l, _ in
                 ((f, b, s, l, n) for f, b, s, l, n in
                  mod._iter_coco(str(ann)))}
        boxes, labels = items["a.jpg"]
        np.testing.assert_allclose(boxes[0], [2, 3, 12, 11])  # xywh->xyxy
        assert list(labels) == [0, 1]

    def test_end_to_end_write(self, tmp_path):
        import subprocess
        import sys

        import cv2

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "a.jpg"),
                    np.zeros((24, 32, 3), np.uint8))
        ann = tmp_path / "ann.json"
        ann.write_text(json.dumps(_tiny_coco()))
        out = tmp_path / "vis"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(_TOOLS, "draw_bbox.py"),
             "--coco", str(ann), "--img-root", str(img_dir),
             "--out", str(out)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        assert (out / "a.jpg").exists()


class TestPublish:
    def test_publish_strips_and_stamps(self, tmp_path):
        mod = _load("ckpt_tool")
        raw = {
            "step": np.asarray(7, np.int32),
            "params": {"w": np.ones((3, 3), np.float32)},
            "ema_params": {"w": np.full((3, 3), 0.5, np.float32)},
            "opt_state": {"mu": {"w": np.zeros((3, 3), np.float32)}},
        }
        dst = tmp_path / "pub"
        args = argparse.Namespace(src="src", dst=str(dst), keep_ema=True)
        mod.cmd_publish(args, raw)

        published = [p for p in os.listdir(tmp_path)
                     if p.startswith("pub-")]
        assert len(published) == 1 and len(published[0]) == len("pub-") + 8
        assert not dst.exists()

        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            str(tmp_path / published[0]))
        assert sorted(restored) == ["ema_params", "params"]
        np.testing.assert_allclose(restored["params"]["w"], 1.0)

        # content-addressed: identical payload -> identical hash
        dst2 = tmp_path / "pub2"
        mod.cmd_publish(
            argparse.Namespace(src="s", dst=str(dst2), keep_ema=True), raw)
        p2 = [p for p in os.listdir(tmp_path) if p.startswith("pub2-")]
        assert p2[0].split("-")[-1] == published[0].split("-")[-1]


class TestMaybeInitDistributed:
    def test_noop_without_config(self, monkeypatch):
        from glsdet_tpu.parallel.mesh import maybe_init_distributed

        for var in ("GLSDET_COORDINATOR", "GLSDET_NUM_PROCESSES",
                    "GLSDET_PROCESS_ID", "SLURM_NTASKS", "SLURM_PROCID"):
            monkeypatch.delenv(var, raising=False)
        assert maybe_init_distributed() is False
