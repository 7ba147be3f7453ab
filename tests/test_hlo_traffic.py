"""The HBM-traffic model behind the train/serving rooflines
(scripts/hlo_traffic.py; ARCHITECTURE §9 round-4)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))

from hlo_traffic import compiled_traffic, hlo_entry_traffic  # noqa: E402


class TestTextParser:
    def test_plumbing_and_operand_resolution(self):
        text = """
HloModule m

ENTRY %main (p0: f32[8,128]) -> f32[8,128] {
  %p0 = f32[8,128]{1,0} parameter(0)
  %c = f32[] constant(1)
  %b = f32[8,128]{1,0} broadcast(%c), dimensions={}
  ROOT %add = f32[8,128]{1,0} add(%p0, %b)
}
"""
        t = hlo_entry_traffic(text)
        # parameter/constant move nothing; broadcast: tiny in + full
        # out; add: two full operands + one result
        full = 8 * 128 * 4
        assert t["instructions"] == 2
        assert t["bytes"] == (4 + full) + (full + full + full)

    def test_slice_reads_result_size(self):
        text = """
ENTRY %main () -> f32[8,128] {
  %p0 = f32[1024,128]{1,0} parameter(0)
  ROOT %s = f32[8,128]{1,0} slice(%p0), slice={[0:8], [0:128]}
}
"""
        t = hlo_entry_traffic(text)
        # read + write both at RESULT size, not the 1024-row operand
        assert t["bytes"] == 2 * 8 * 128 * 4

    def test_async_pair_not_double_billed(self):
        text = """
ENTRY %main () -> f32[8,128] {
  %p0 = f32[8,128]{1,0} parameter(0)
  %st = ((f32[8,128]), f32[8,128], s32[]) fusion-start(%p0), calls=%c
  ROOT %dn = f32[8,128]{1,0} fusion-done(%st)
}
"""
        t = hlo_entry_traffic(text)
        full = 8 * 128 * 4
        # -start bills its operand read, -done bills its result write;
        # the wrapper tuple (which aliases both) is never counted
        assert t["bytes"] == 2 * full

    def test_tuple_result_types(self):
        text = """
ENTRY %main () -> (f32[16], s32[16]) {
  %p0 = f32[16]{0} parameter(0)
  ROOT %f = (f32[16]{0}, s32[16]{0}) fusion(%p0), kind=kLoop, calls=%c
}
"""
        t = hlo_entry_traffic(text)
        assert t["bytes"] == 16 * 4 + (16 * 4 + 16 * 4)

    def test_bf16_and_int8_sizes(self):
        text = """
ENTRY %main () -> bf16[4,128] {
  %p0 = s8[4,128]{1,0} parameter(0)
  ROOT %cv = bf16[4,128]{1,0} convert(%p0)
}
"""
        t = hlo_entry_traffic(text)
        assert t["bytes"] == 4 * 128 * 1 + 4 * 128 * 2


class TestCompiled:
    def test_matmul_traffic_exact(self):
        a = 256
        c = jax.jit(lambda x, y: x @ y).lower(
            jnp.ones((a, a)), jnp.ones((a, a))).compile()
        t = compiled_traffic(c)
        assert t["bytes"] == 3 * a * a * 4

    def test_elementwise_chain_bounded(self):
        n = 512
        c = jax.jit(lambda x: jnp.tanh(jnp.sin(x) * 2 + jnp.cos(x))
                    ).lower(jnp.ones((n, n))).compile()
        t = compiled_traffic(c)
        ca = float(c.cost_analysis()["bytes accessed"])
        # at least read-input + write-output, never above the cost
        # model's everything-at-full-size count; when the backend fuses
        # the whole chain (TPU) traffic collapses to exactly in+out
        assert 2 * n * n * 4 <= t["bytes"] <= ca + 1
        if t["instructions"] == 1:
            assert t["bytes"] == 2 * n * n * 4

    def test_train_step_sanity(self):
        """A real (tiny) train step: traffic is positive, bounded by the
        cost model, and scales with batch."""
        import flax.linen as nn
        import optax

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(16, (3, 3))(x)
                x = nn.relu(x)
                return nn.Conv(4, (3, 3))(x)

        m = M()
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 8)))
        tx = optax.sgd(0.1, momentum=0.9)

        def make(b):
            x = jnp.ones((b, 16, 16, 8))
            y = jnp.ones((b, 16, 16, 4))
            opt = tx.init(v["params"])

            def step(params, opt_state):
                def loss(p):
                    return jnp.mean((m.apply({"params": p}, x) - y) ** 2)

                g = jax.grad(loss)(params)
                up, new_opt = tx.update(g, opt_state, params)
                return optax.apply_updates(params, up), new_opt

            return jax.jit(step).lower(v["params"], opt).compile()

        t2 = compiled_traffic(make(2))
        t8 = compiled_traffic(make(8))
        assert 0 < t2["bytes"] < t8["bytes"]
        c8 = make(8)
        assert t8["bytes"] <= float(
            c8.cost_analysis()["bytes accessed"]) * 1.01


def test_flops_by_dtype_counts_conv_and_dot_macs():
    """compiled_flops_by_dtype counts 2*MACs of convolution/dot exactly
    on the CPU backend (no layout padding there)."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.append(os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from hlo_traffic import compiled_flops_by_dtype

    def f(x, k):
        a = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = jnp.dot(x[:, 0, 0], k[0, 0])
        return a.sum() + c.sum()

    x = jnp.zeros((2, 16, 16, 8), jnp.float32)
    k = jnp.zeros((3, 3, 8, 32), jnp.float32)
    fl = compiled_flops_by_dtype(jax.jit(f).lower(x, k).compile())
    conv_macs2 = 2 * 2 * 16 * 16 * 32 * 3 * 3 * 8
    dot_macs2 = 2 * 2 * 32 * 8
    assert sum(fl.values()) == conv_macs2 + dot_macs2, fl


def test_flops_by_dtype_classifies_s8_tpu_hlo():
    """The s8 bucket: TPU HLO keeps int8 convs on s8 operands referenced
    by bare name (fusion outputs) — pin the classification on a
    representative hand-written module (the CPU backend upcasts s8 to
    s32 pre-conv, so a compiled fixture can't exercise this path)."""
    import sys

    sys.path.append(os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from hlo_traffic import hlo_flops_by_dtype

    hlo = """
HloModule jit_f

ENTRY %main () -> s32[] {
  %fusion.a = s8[2,16,16,8]{3,2,1,0:T(8,128)(4,1)} fusion(), kind=kLoop, calls=%fused_a
  %fusion.b = s8[3,3,8,32]{3,2,1,0:T(8,128)(4,1)} fusion(), kind=kLoop, calls=%fused_a
  %convolution.1 = s32[2,16,16,32]{3,2,1,0:T(8,128)} convolution(%fusion.a, %fusion.b), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  %p.bf = bf16[2,16,16,8]{3,2,1,0} parameter(1)
  %k.bf = bf16[3,3,8,32]{3,2,1,0} parameter(2)
  %conv.bf = bf16[2,16,16,32]{3,2,1,0} convolution(%p.bf, %k.bf), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}
"""
    fl = hlo_flops_by_dtype(hlo)
    conv_macs2 = 2 * 2 * 16 * 16 * 32 * 3 * 3 * 8
    assert fl.get("s8") == conv_macs2, fl
    assert fl.get("bf16") == conv_macs2, fl
