"""StableHLO export parity tests — the analog of the reference's ONNX
parity suite (tests/test_onnx/test_head.py): exported artifact must
reproduce the jitted forward bit-for-bit on the same platform."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from glsdet_tpu.eval.postprocess import yolox_postprocess
from glsdet_tpu.models import YOLOXDetector


def test_export_roundtrip_forward():
    model = YOLOXDetector(num_classes=5, phi="nano")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    variables = model.init(rng, x, train=False)

    def fn(images):
        return model.apply(variables, images, train=False)

    exported = jexport.export(jax.jit(fn))(x)
    blob = exported.serialize()
    assert len(blob) > 1000
    again = jexport.deserialize(blob)
    out_ref = jax.jit(fn)(x)
    out_exp = again.call(x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        out_ref, out_exp)


def test_export_with_nms():
    model = YOLOXDetector(num_classes=5, phi="nano")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    variables = model.init(rng, x, train=False)

    def fn(images):
        cls, reg, obj = model.apply(variables, images, train=False)
        return yolox_postprocess(cls, reg, obj, (64, 64), max_dets=20)

    exported = jexport.export(jax.jit(fn))(x)
    out = jexport.deserialize(exported.serialize()).call(x)
    assert out["boxes"].shape == (1, 20, 4)
