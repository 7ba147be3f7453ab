"""Forward-parity of the variant zoo blocks vs the ACTUAL reference
torch modules (gated on /root/reference + torch, like test_torch_parity).

Every block here is pure torch in the reference (no mmcv/torchvision),
so it runs in this image: random-initialize the reference module,
transplant its weights into the flax twin, and require the forwards to
agree to float tolerance.  This pins, per block, the exact wiring AND
the subtle semantics this sweep was built to catch:

- torch PixelShuffle channel-MAJOR ordering in FFA (ffa.py:22),
- Non_local_Block's forward actually using dot_product (matmul / HW,
  no softmax) (Non_local_family.py:43),
- DYReLU's h_sigmoid gates and (a1, b1, a2, b2) split order
  (dyrelu.py:39,88-96),
- MS_CAM's torch-default BN eps 1e-5 (mscam.py:14-29),
- TransformerEncoderLayer post-norm layout in BatchFormer
  (batchformer.py:6).

DyConv/DyHead itself needs mmcv's modulated_deform_conv2d (absent), so
its deformable stage cannot be runtime-compared; its DYReLU/h_sigmoid
pieces are covered here and the deform conv is oracle-tested in
tests/test_variants.py.
"""

from __future__ import annotations

import copy
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/yolox-drone"
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not present")


@pytest.fixture(scope="module")
def ref_zoo():
    sys.path.insert(0, REF)
    try:
        import importlib

        mods = {
            "ffa": importlib.import_module("models.ffa.ffa"),
            "lsk": importlib.import_module("models.lsk.LSK"),
            "seblock": importlib.import_module("models.block.SEBlock"),
            "mscam": importlib.import_module("models.block.mscam"),
            "cam": importlib.import_module("models.block.CAM"),
            "nonlocal": importlib.import_module(
                "models.new.Non_local_family"),
            "dyrelu": importlib.import_module("models.new.dyrelu"),
            "batchformer": importlib.import_module(
                "models.batchformer.batchformer"),
            "identityconv": importlib.import_module(
                "models.block.IdentityConv"),
        }
        yield mods
    finally:
        sys.path.remove(REF)
        for name in [n for n in sys.modules if n == "models"
                     or n.startswith("models.")]:
            del sys.modules[name]


# ---------------------------------------------------------------- helper

class Transplant:
    """Overwrite flax template leaves from torch tensors, tracking
    coverage so a forgotten mapping fails loudly instead of silently
    comparing against random init."""

    def __init__(self, template):
        self.v = copy.deepcopy(jax.tree.map(np.asarray, template))
        self.touched = set()

    def _set(self, dotted, val):
        parts = dotted.split("/")
        node = self.v
        for p in parts[:-1]:
            node = node[p]
        assert parts[-1] in node, f"no leaf {dotted}"
        assert node[parts[-1]].shape == val.shape, (
            f"{dotted}: {node[parts[-1]].shape} vs {val.shape}")
        node[parts[-1]] = val.astype(np.float32)
        self.touched.add(dotted)

    def conv(self, path, w, b=None):
        # torch (O, I/g, kh, kw) -> flax (kh, kw, I/g, O)
        self._set(path + "/kernel", w.transpose(2, 3, 1, 0))
        if b is not None:
            self._set(path + "/bias", b)

    def dense(self, path, w, b=None):
        self._set(path + "/kernel", w.T)
        if b is not None:
            self._set(path + "/bias", b)

    def bn(self, ppath, spath, prefix, state):
        self._set(ppath + "/scale", state[prefix + ".weight"])
        self._set(ppath + "/bias", state[prefix + ".bias"])
        self._set(spath + "/mean", state[prefix + ".running_mean"])
        self._set(spath + "/var", state[prefix + ".running_var"])

    def ln(self, path, w, b):
        self._set(path + "/scale", w)
        self._set(path + "/bias", b)

    def done(self):
        leaves = set()

        def walk(node, prefix):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, f"{prefix}/{k}" if prefix else k)
            else:
                leaves.add(prefix)

        walk(self.v, "")
        missing = leaves - self.touched
        assert not missing, f"untransplanted leaves: {sorted(missing)}"
        return jax.tree.map(jnp.asarray, self.v)


import jax  # noqa: E402  (after torch import guard)
import jax.numpy as jnp  # noqa: E402


def _state(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _randomize_bn(module, seed):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.rand(m.running_mean.shape, generator=g) - 0.5)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.8 + 0.4)


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _cmp(got, want, tol=2e-5, msg=""):
    np.testing.assert_allclose(np.asarray(got), want, atol=tol, rtol=tol,
                               err_msg=msg)


def _convnormact(tp, flax_prefix, torch_prefix, state):
    """BaseConv (conv+BN) -> ConvNormAct subtree."""
    tp.conv(f"params/{flax_prefix}/conv", state[f"{torch_prefix}.conv.weight"])
    tp.bn(f"params/{flax_prefix}/bn", f"batch_stats/{flax_prefix}/bn",
          f"{torch_prefix}.bn", state)


# ----------------------------------------------------------------- tests

def test_se_parity(ref_zoo):
    from glsdet_tpu.models.variants import SE

    torch.manual_seed(0)
    ref = ref_zoo["ffa"].SE(64).eval()
    state = _state(ref)
    model = SE()
    x = np.random.RandomState(1).rand(2, 6, 5, 64).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    tp.dense("params/fc1", state["fc.0.weight"])
    tp.dense("params/fc2", state["fc.2.weight"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want)


def test_ffa_parity(ref_zoo):
    """FFA incl. the PixelShuffle channel ordering (ffa.py:22)."""
    from glsdet_tpu.models.variants import FFA

    torch.manual_seed(1)
    c = 16
    ref = ref_zoo["ffa"].FFA(c).eval()
    _randomize_bn(ref, 3)
    state = _state(ref)

    model = FFA(channels=c, act="relu")
    rs = np.random.RandomState(2)
    bottom = rs.rand(2, 8, 8, c).astype(np.float32)
    top = rs.rand(2, 4, 4, 2 * c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(bottom),
                     jnp.asarray(top), train=False)
    tp = Transplant(tpl)
    _convnormact(tp, "scale", "scale", state)
    _convnormact(tp, "content1", "create_content_extractor.0", state)
    _convnormact(tp, "content2", "create_content_extractor.1", state)
    tp.dense("params/se/fc1", state["se1.fc.0.weight"])
    tp.dense("params/se/fc2", state["se1.fc.2.weight"])
    _convnormact(tp, "texture", "create_text_extractor.0", state)
    _convnormact(tp, "reduce", "conv3", state)
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(bottom), _nchw(top)))
    got = model.apply(v, jnp.asarray(bottom), jnp.asarray(top), train=False)
    _cmp(got, want, tol=1e-4)


def test_lsk_block_parity(ref_zoo):
    from glsdet_tpu.models.variants import LSKBlock

    torch.manual_seed(2)
    c = 32
    ref = ref_zoo["lsk"].LSKblock(c).eval()
    state = _state(ref)
    model = LSKBlock()
    x = np.random.RandomState(3).rand(2, 12, 12, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    for name in ("conv0", "conv_spatial", "conv1", "conv2",
                 "conv_squeeze", "conv"):
        tp.conv(f"params/{name}", state[f"{name}.weight"],
                state[f"{name}.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want, tol=1e-4)


def test_lsk_attention_parity(ref_zoo):
    from glsdet_tpu.models.variants import LSKAttention

    torch.manual_seed(3)
    c = 16
    ref = ref_zoo["lsk"].Attention(c).eval()
    state = _state(ref)
    model = LSKAttention()
    x = np.random.RandomState(4).rand(2, 8, 8, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    tp.conv("params/proj1", state["proj_1.weight"], state["proj_1.bias"])
    tp.conv("params/proj2", state["proj_2.weight"], state["proj_2.bias"])
    for name in ("conv0", "conv_spatial", "conv1", "conv2",
                 "conv_squeeze", "conv"):
        tp.conv(f"params/lsk/{name}",
                state[f"spatial_gating_unit.{name}.weight"],
                state[f"spatial_gating_unit.{name}.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want, tol=1e-4)


def test_seblock_parity(ref_zoo):
    from glsdet_tpu.models.variants import SEBlock

    torch.manual_seed(4)
    c = 32
    ref = ref_zoo["seblock"].SEBlock(c).eval()
    state = _state(ref)
    model = SEBlock()
    x = np.random.RandomState(5).rand(2, 7, 9, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    tp.dense("params/fc1", state["linear1.0.weight"])
    tp.dense("params/fc2", state["linear2.0.weight"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want)


def test_seblockfpn_parity(ref_zoo):
    from glsdet_tpu.models.variants import SEBlockFPN

    torch.manual_seed(5)
    chans = (16, 32)
    ref = ref_zoo["seblock"].SEBlockFPN(sum(chans)).eval()
    state = _state(ref)
    model = SEBlockFPN()
    rs = np.random.RandomState(6)
    feats = [rs.rand(2, 8, 8, chans[0]).astype(np.float32),
             rs.rand(2, 4, 4, chans[1]).astype(np.float32)]
    tpl = model.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats])
    tp = Transplant(tpl)
    tp.dense("params/fc1", state["linear1.0.weight"])
    tp.dense("params/fc2", state["linear2.0.weight"])
    v = tp.done()
    with torch.no_grad():
        want = [_nhwc(t) for t in ref([_nchw(f) for f in feats])]
    got = model.apply(v, [jnp.asarray(f) for f in feats])
    for g, w in zip(got, want):
        _cmp(g, w)


def test_seattention_parity(ref_zoo):
    """SEAttention's HW==channels quirk (SEBlock.py:74)."""
    from glsdet_tpu.models.variants import SEAttention

    torch.manual_seed(6)
    h = w = 6
    ref = ref_zoo["seblock"].SEAttention(h * w).eval()
    state = _state(ref)
    model = SEAttention(channels=h * w)
    x = np.random.RandomState(7).rand(2, h, w, 20).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    tp.dense("params/fc1", state["linear1.0.weight"])
    tp.dense("params/fc2", state["linear2.0.weight"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want)


def test_mscam_parity(ref_zoo):
    """MS_CAM incl. torch-default BN eps=1e-5 (mscam.py)."""
    from glsdet_tpu.models.variants import MSCAM

    torch.manual_seed(7)
    c = 32
    ref = ref_zoo["mscam"].MS_CAM(channels=c, r=4).eval()
    _randomize_bn(ref, 8)
    state = _state(ref)
    model = MSCAM()
    x = np.random.RandomState(9).rand(2, 6, 6, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    tp = Transplant(tpl)
    for fl, to in (("local", "local_att"), ("global", "global_att")):
        off = 1 if fl == "global" else 0  # global_att has the pool at .0
        tp.conv(f"params/{fl}_conv1", state[f"{to}.{0 + off}.weight"],
                state[f"{to}.{0 + off}.bias"])
        tp.bn(f"params/{fl}_bn1", f"batch_stats/{fl}_bn1",
              f"{to}.{1 + off}", state)
        tp.conv(f"params/{fl}_conv2", state[f"{to}.{3 + off}.weight"],
                state[f"{to}.{3 + off}.bias"])
        tp.bn(f"params/{fl}_bn2", f"batch_stats/{fl}_bn2",
              f"{to}.{4 + off}", state)
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x), train=False), want, tol=1e-4)


def test_conaug_parity(ref_zoo):
    from glsdet_tpu.models.variants import ConAugModule

    torch.manual_seed(8)
    ref = ref_zoo["cam"].ConAugModule(16, 8).eval()
    state = _state(ref)
    model = ConAugModule(out_channels=8)
    x = np.random.RandomState(10).rand(2, 9, 9, 16).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    for d in (1, 2, 3):
        tp.conv(f"params/conv_d{d}", state[f"conv{d}.weight"],
                state[f"conv{d}.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want, tol=1e-4)


def test_nonlocal_parity(ref_zoo):
    """Non_local_Block's ACTUAL forward = dot_product: matmul / HW,
    no softmax (Non_local_family.py:27-30,43)."""
    from glsdet_tpu.models.variants import NonLocalBlock

    torch.manual_seed(9)
    c = 24
    ref = ref_zoo["nonlocal"].Non_local_Block(c).eval()
    state = _state(ref)
    model = NonLocalBlock()
    x = np.random.RandomState(11).rand(2, 7, 5, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    for fl, to in (("theta", "theta"), ("phi", "phi"), ("g", "g"),
                   ("out", "conv_out")):
        tp.conv(f"params/{fl}", state[f"{to}.weight"], state[f"{to}.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want, tol=1e-4)


def test_dyrelu_parity(ref_zoo):
    """DYReLU defaults: K2+bias (exp=4), h_sigmoid gates, split order
    (a1, b1, a2, b2), lambda_a*2, b unscaled (dyrelu.py:88-96)."""
    from glsdet_tpu.models.variants import DyReLU

    torch.manual_seed(10)
    c = 32
    ref = ref_zoo["dyrelu"].DYReLU(c, c).eval()
    state = _state(ref)
    model = DyReLU()
    x = (np.random.RandomState(12).rand(2, 6, 6, c).astype(np.float32)
         * 2 - 1)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    tp.dense("params/fc1", state["fc.0.weight"], state["fc.0.bias"])
    tp.dense("params/fc2", state["fc.2.weight"], state["fc.2.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want)


def test_batchformer_parity(ref_zoo):
    """TransformerDecorator's encoder layer attends across the batch;
    post-norm layout, relu FF (batchformer.py:6,14-21).  Dropout forced
    off on both sides for determinism."""
    from glsdet_tpu.models.variants import BatchFormer

    torch.manual_seed(11)
    dim, heads = 32, 4
    ref = ref_zoo["batchformer"].TransformerDecorator(
        pool_layer=torch.nn.Identity(), dim=dim)
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()  # forward_feats needs self.training=True overall
    # attention dropout lives inside MultiheadAttention (an F.mha
    # flag, not an nn.Dropout child) — eval it too
    ref.encoder_layers.self_attn.eval()
    state = _state(ref)

    model = BatchFormer(dim=dim, num_heads=heads, dropout=0.0)
    b = 5
    feat = np.random.RandomState(13).rand(b, dim).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(feat), train=True)
    tp = Transplant(tpl)
    pre = "encoder_layers."
    w = state[pre + "self_attn.in_proj_weight"]
    bi = state[pre + "self_attn.in_proj_bias"]
    hd = dim // heads
    for i, name in enumerate(("query", "key", "value")):
        tp._set(f"params/attn/{name}/kernel",
                w[i * dim:(i + 1) * dim].T.reshape(dim, heads, hd))
        tp._set(f"params/attn/{name}/bias",
                bi[i * dim:(i + 1) * dim].reshape(heads, hd))
    tp._set("params/attn/out/kernel",
            state[pre + "self_attn.out_proj.weight"].T.reshape(
                heads, hd, dim))
    tp._set("params/attn/out/bias",
            state[pre + "self_attn.out_proj.bias"])
    tp.dense("params/fc1", state[pre + "linear1.weight"],
             state[pre + "linear1.bias"])
    tp.dense("params/fc2", state[pre + "linear2.weight"],
             state[pre + "linear2.bias"])
    tp.ln("params/ln1", state[pre + "norm1.weight"],
          state[pre + "norm1.bias"])
    tp.ln("params/ln2", state[pre + "norm2.weight"],
          state[pre + "norm2.bias"])
    v = tp.done()

    with torch.no_grad():
        # reference treats the batch as the sequence: (B, 1, dim) with
        # torch's default (seq, batch, feature) layout
        want = ref(torch.from_numpy(
            feat[:, :, None, None])).numpy()  # pool=GAP of (B,dim,1,1)
    got = model.apply(v, jnp.asarray(feat), train=True)
    assert got.shape == (2 * b, dim)
    _cmp(got, want, tol=1e-4)


def test_patch_conv_nonlocal_parity(ref_zoo):
    """Quadrant non-local downsampler (Non_local_family.py:50)."""
    from glsdet_tpu.models.variants import PatchConvNonLocal

    torch.manual_seed(12)
    cin, cout = 16, 24
    ref = ref_zoo["nonlocal"].Patch_Conv_NonLocal(
        in_channel=cin, out_channel=cout).eval()
    _randomize_bn(ref, 14)
    state = _state(ref)
    model = PatchConvNonLocal(out_channels=cout)
    x = np.random.RandomState(15).rand(2, 16, 16, cin).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    tp = Transplant(tpl)
    for q in ("lt", "lb", "rt", "rb"):
        _convnormact(tp, f"conv_{q}", f"feat_patchconv_{q}", state)
        for fl, to in (("theta", "theta"), ("phi", "phi"), ("g", "g"),
                       ("out", "conv_out")):
            tp.conv(f"params/nl_{q}/{fl}",
                    state[f"feat_patchconv_{q}_nonlocal.{to}.weight"],
                    state[f"feat_patchconv_{q}_nonlocal.{to}.bias"])
    for s in ("l", "r", "t", "b"):
        _convnormact(tp, f"conv_{s}", f"feat_patchconv_{s}", state)
    tp.conv("params/channel_conv", state["channel_conv.weight"],
            state["channel_conv.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x), train=False), want, tol=1e-4)


def test_spatial_attention_parity(ref_zoo):
    """CBAM spatial gate (Non_local_family.py:423)."""
    from glsdet_tpu.models.variants import SpatialAttention

    torch.manual_seed(13)
    ref = ref_zoo["nonlocal"].SpatialAttention().eval()
    state = _state(ref)
    model = SpatialAttention()
    x = np.random.RandomState(16).rand(2, 9, 11, 12).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = Transplant(tpl)
    tp.conv("params/conv", state["conv.weight"], state["conv.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want)


def _transplant_quad_nl(tp, flax_prefix, torch_prefix, state):
    """The 4 per-quadrant Non_local_Blocks shared by the _new modules."""
    for q in ("lt", "lb", "rt", "rb"):
        for fl, to in (("theta", "theta"), ("phi", "phi"), ("g", "g"),
                       ("out", "conv_out")):
            tp.conv(
                f"params/{flax_prefix}nl_{q}/{fl}",
                state[f"{torch_prefix}feat_patchconv_{q}_nonlocal"
                      f".{to}.weight"],
                state[f"{torch_prefix}feat_patchconv_{q}_nonlocal"
                      f".{to}.bias"])


def test_patch_nonlocal_quad_parity(ref_zoo):
    """Resolution-preserving quadrant non-local
    (Non_local_family.py:206 Patch_Conv_NonLocal_new); channel_scale=1
    is the only shape-consistent reference configuration."""
    from glsdet_tpu.models.variants import PatchNonLocalQuad

    torch.manual_seed(14)
    c, cout = 16, 24
    ref = ref_zoo["nonlocal"].Patch_Conv_NonLocal_new(
        in_channel=c, out_channel=cout, channel_scale=1).eval()
    _randomize_bn(ref, 17)
    state = _state(ref)
    model = PatchNonLocalQuad(out_channels=cout, channel_scale=1.0)
    x = np.random.RandomState(18).rand(2, 10, 12, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    tp = Transplant(tpl)
    _transplant_quad_nl(tp, "", "", state)
    _convnormact(tp, "channel_conv", "channel_conv", state)
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x), train=False), want, tol=1e-4)


def test_van_attention_parity(ref_zoo):
    """VAN wrapper (Non_local_family.py:252): 1x1 -> exact GELU ->
    quadrant gating unit -> 1x1 -> residual."""
    from glsdet_tpu.models.variants import VANAttention

    torch.manual_seed(15)
    c = 16
    ref = ref_zoo["nonlocal"].Attention(c).eval()
    _randomize_bn(ref, 19)
    state = _state(ref)
    model = VANAttention()
    x = np.random.RandomState(20).rand(2, 8, 8, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    tp = Transplant(tpl)
    tp.conv("params/proj_1", state["proj_1.weight"], state["proj_1.bias"])
    tp.conv("params/proj_2", state["proj_2.weight"], state["proj_2.bias"])
    _transplant_quad_nl(tp, "sgu/", "spatial_gating_unit.", state)
    _convnormact(tp, "sgu/channel_conv",
                 "spatial_gating_unit.channel_conv", state)
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x), train=False), want, tol=1e-4)


def test_patch_conv_nonlocal_44_parity(ref_zoo):
    """4x4-grid downsampler (Non_local_family.py:359)."""
    from glsdet_tpu.models.variants import PatchConvNonLocal44

    torch.manual_seed(16)
    cin, cout = 16, 32  # the reference-consistent out == 4*mid shape
    ref = ref_zoo["nonlocal"].Patch_Conv_NonLocal_44(
        in_channel=cin, out_channel=cout).eval()
    _randomize_bn(ref, 21)
    state = _state(ref)
    model = PatchConvNonLocal44(out_channels=cout)
    x = np.random.RandomState(22).rand(2, 16, 16, cin).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    tp = Transplant(tpl)
    for q in ("lt", "lb", "rt", "rb"):
        inner_t = f"patchconv_{q}_nonlocal."
        inner_f = f"patch_{q}/"
        for qq in ("lt", "lb", "rt", "rb"):
            _convnormact(tp, f"{inner_f}conv_{qq}",
                         f"{inner_t}feat_patchconv_{qq}", state)
            for fl, to in (("theta", "theta"), ("phi", "phi"),
                           ("g", "g"), ("out", "conv_out")):
                tp.conv(
                    f"params/{inner_f}nl_{qq}/{fl}",
                    state[f"{inner_t}feat_patchconv_{qq}_nonlocal"
                          f".{to}.weight"],
                    state[f"{inner_t}feat_patchconv_{qq}_nonlocal"
                          f".{to}.bias"])
        for s in ("l", "r", "t", "b"):
            _convnormact(tp, f"{inner_f}conv_{s}",
                         f"{inner_t}feat_patchconv_{s}", state)
        tp.conv(f"params/{inner_f}channel_conv",
                state[f"{inner_t}channel_conv.weight"],
                state[f"{inner_t}channel_conv.bias"])
    for s in ("l", "r", "t", "b"):
        _convnormact(tp, f"conv_{s}", f"feat_patchconv_{s}", state)
    tp.conv("params/channel_conv", state["channel_conv.weight"],
            state["channel_conv.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x), train=False), want, tol=1e-4)


@pytest.mark.parametrize("ksize", [1, 3, 5, 7, 9])
def test_identity_conv_parity(ref_zoo, ksize):
    """Identity_Conv family (IdentityConv.py:7-105): (a) identical
    identity forward at init, (b) transplanted randomized weights."""
    from glsdet_tpu.models.variants import IdentityConv

    cls = {1: "Identity_Conv", 3: "Identity_Conv_three",
           5: "Identity_Conv_five", 7: "Identity_Conv_seven",
           9: "Identity_Conv_nine"}[ksize]
    c = 8
    ref = ref_zoo["identityconv"].__dict__[cls](
        in_channels=c, out_channels=c).eval()
    model = IdentityConv(features=c, kernel_size=ksize)
    x = np.random.RandomState(23 + ksize).rand(
        2, 12, 12, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # (a) both inits are the identity map
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(tpl, jnp.asarray(x)), want,
         msg=f"identity init k={ksize}")
    _cmp(want, x, tol=1e-5, msg="reference init is the identity")

    # (b) randomized weights transplant
    g = torch.Generator().manual_seed(24 + ksize)
    ref.conv.weight.data = torch.randn(ref.conv.weight.shape,
                                       generator=g) * 0.1
    ref.conv.bias.data = torch.randn(ref.conv.bias.shape, generator=g)
    tp = Transplant(tpl)
    tp.conv("params/conv", _state(ref)["conv.weight"],
            _state(ref)["conv.bias"])
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x)), want, tol=1e-5)


def test_reverse_focus_parity(ref_zoo):
    """Reverse_Focus (IdentityConv.py:107): depth-to-space with
    torch-slice channel-group ordering (g = channel % 4); the
    reference's repeat-buffer construction requires in == out."""
    from glsdet_tpu.models.variants import ReverseFocus

    torch.manual_seed(17)
    c = 12
    ref = ref_zoo["identityconv"].Reverse_Focus(c, c).eval()
    _randomize_bn(ref, 25)
    state = _state(ref)
    model = ReverseFocus(out_channels=c)
    x = np.random.RandomState(26).rand(2, 6, 7, c).astype(np.float32)
    tpl = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    tp = Transplant(tpl)
    _convnormact(tp, "conv", "conv", state)
    v = tp.done()
    with torch.no_grad():
        want = _nhwc(ref(_nchw(x)))
    _cmp(model.apply(v, jnp.asarray(x), train=False), want, tol=1e-4)
