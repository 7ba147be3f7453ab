"""Conv+BN folding and VOC converter tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestFuseConvBn:
    @pytest.mark.parametrize("build", ["yolox", "resnet"])
    def test_outputs_identical(self, build):
        from glsdet_tpu.models import MPDet, YOLOXDetector
        from glsdet_tpu.models.fuse import fuse_conv_bn

        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (1, 64, 64, 3))
        if build == "yolox":
            model = YOLOXDetector(num_classes=3, phi="nano")
        else:
            model = MPDet(num_classes=3, depth=18, proxies_list=(2, 3, 2))
        variables = model.init(rng, x, train=False)
        # make batch_stats non-trivial so folding actually does work
        variables = jax.tree_util.tree_map_with_path(
            lambda p, v: (v + 0.3 if "mean" in str(p[-1]) else
                          v * 1.7 if "var" in str(p[-1]) else v),
            variables)
        fused, n = fuse_conv_bn(variables)
        assert n > 10  # every ConvNormAct folded
        ref = model.apply(variables, x, train=False)
        out = model.apply(fused, x, train=False)
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(out)):
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)

    def test_original_untouched(self):
        from glsdet_tpu.models import YOLOXDetector
        from glsdet_tpu.models.fuse import fuse_conv_bn

        rng = jax.random.PRNGKey(1)
        model = YOLOXDetector(num_classes=3, phi="nano")
        variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
        before = jax.tree_util.tree_map(np.asarray, variables)
        fuse_conv_bn(variables)
        after = jax.tree_util.tree_map(np.asarray, variables)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)


@pytest.fixture()
def voc_dir(tmp_path):
    os.makedirs(tmp_path / "Annotations")
    os.makedirs(tmp_path / "JPEGImages")
    os.makedirs(tmp_path / "ImageSets/Main")
    xml = """<annotation>
      <size><width>160</width><height>120</height></size>
      <object><name>car</name><difficult>0</difficult>
        <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
      </object>
      <object><name>car</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>9</xmax><ymax>9</ymax></bndbox>
      </object>
      <object><name>unknown</name>
        <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>30</xmax><ymax>30</ymax></bndbox>
      </object>
      <object><name>person</name>
        <bndbox><xmin>70</xmin><ymin>10</ymin><xmax>90</xmax><ymax>40</ymax></bndbox>
      </object>
    </annotation>"""
    for i in range(2):
        (tmp_path / "Annotations" / f"img{i}.xml").write_text(xml)
    (tmp_path / "ImageSets/Main/train.txt").write_text("img0\nimg1\n")
    return tmp_path


class TestVocConverter:
    def test_to_coco(self, voc_dir, tmp_path):
        from glsdet_tpu.data.voc import voc_to_coco

        out = str(tmp_path / "o" / "voc.json")
        coco = voc_to_coco(str(voc_dir), out, ("car", "person"))
        assert os.path.exists(out)
        assert len(coco["images"]) == 2
        # difficult + unknown dropped -> 2 objects per image
        assert len(coco["annotations"]) == 4
        a = coco["annotations"][0]
        assert a["category_id"] == 1  # car, 1-based
        assert a["bbox"] == [10.0, 20.0, 40.0, 40.0]
        assert coco["images"][0]["width"] == 160

        from glsdet_tpu.data.coco import CocoDataset

        ds = CocoDataset(out, str(voc_dir / "JPEGImages"))
        assert len(ds) == 2
        np.testing.assert_allclose(ds.records[0].boxes[0], [10, 20, 50, 60])

    def test_txt_lines(self, voc_dir):
        from glsdet_tpu.data.voc import voc_to_txt_lines

        lines = voc_to_txt_lines(str(voc_dir), ("car", "person"))
        assert len(lines) == 2
        parts = lines[0].split()
        assert parts[0].endswith("img0.jpg")
        assert parts[1] == "10,20,50,60,0"
        assert parts[2] == "70,10,90,40,1"


class TestBatchFormerV2:
    def test_train_doubles_batch_eval_passthrough(self):
        from glsdet_tpu.models.variants.batchformer import BatchFormerV2

        m = BatchFormerV2(dim=16)
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 8, 32))
        v = m.init({"params": jax.random.PRNGKey(1),
                    "dropout": jax.random.PRNGKey(2)}, x, train=True)
        out_t = m.apply(v, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        assert out_t.shape == (8, 16)   # pre+post streams
        out_e = m.apply(v, x, train=False)
        assert out_e.shape == (4, 16)
        # eval stream == first (untransformed) training stream
        np.testing.assert_allclose(out_t[:4], out_e, atol=1e-5)
