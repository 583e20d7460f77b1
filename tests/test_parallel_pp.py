"""Pipeline parallelism: GPipe fill-drain executor (parallel/pipeline.py)
matches the sequential stage composition exactly on a virtual mesh.

PP targets homogeneous transformer trunks (SAM/SAM2 ViT encoders, RT-DETR
decoder layers). The reference scales with DDP only; PP is a designed-in
TPU axis like TP/SP (SURVEY §2.12)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import Mesh

from yolo_dbl_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


class TinyBlock(nn.Module):
    """Pre-LN MLP residual block — stands in for a ViT block (same shape
    in/out, homogeneous across stages)."""

    dim: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 2)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


def _mesh(n_pipe):
    devs = np.array(jax.devices("cpu")[: 2 * n_pipe]).reshape(2, n_pipe)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_matches_sequential(n_micro):
    n_pipe = 4
    if len(jax.devices("cpu")) < 2 * n_pipe:
        pytest.skip("needs 8 virtual devices")
    mesh = _mesh(n_pipe)
    block = TinyBlock()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 32))
    per_stage = [block.init(jax.random.PRNGKey(i), x) for i in range(n_pipe)]

    want = x
    for p in per_stage:
        want = block.apply(p, want)

    stacked = stack_stage_params(per_stage)
    got = pipeline_apply(
        lambda p, a: block.apply(p, a), stacked, x, mesh, n_micro=n_micro
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pipeline_stage_of_grouped_blocks():
    """SAM-B pattern: [win, win, global] repeats 4x — a stage is the GROUP,
    so stages stay homogeneous while blocks differ inside."""
    n_pipe = 4
    if len(jax.devices("cpu")) < 2 * n_pipe:
        pytest.skip("needs 8 virtual devices")
    mesh = _mesh(n_pipe)
    b1, b2 = TinyBlock(), TinyBlock(dim=32)

    def group_apply(params, a):
        a = b1.apply(params["w0"], a)
        a = b1.apply(params["w1"], a)
        return b2.apply(params["g"], a)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 32))
    per_stage = [
        {
            "w0": b1.init(jax.random.PRNGKey(3 * i), x),
            "w1": b1.init(jax.random.PRNGKey(3 * i + 1), x),
            "g": b2.init(jax.random.PRNGKey(3 * i + 2), x),
        }
        for i in range(n_pipe)
    ]
    want = x
    for p in per_stage:
        want = group_apply(p, want)
    got = pipeline_apply(group_apply, stack_stage_params(per_stage), x, mesh,
                         n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_sam_encoder_pipelined_matches_sequential():
    """encode_image_pipelined == ImageEncoderViT.apply on a tiny SAM-pattern
    encoder (depth 4, [win, global] x 2) over a 2-stage pipeline mesh."""
    n_pipe = 2
    if len(jax.devices("cpu")) < 2 * n_pipe:
        pytest.skip("needs 4 virtual devices")
    from yolo_dbl_tpu.models.sam import ImageEncoderViT
    from yolo_dbl_tpu.models.sam_pp import encode_image_pipelined

    mesh = _mesh(n_pipe)
    enc = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=32, depth=4,
                          num_heads=4, window_size=2,
                          global_attn_indexes=(1, 3), out_chans=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    v = enc.init(jax.random.PRNGKey(1), x)
    # This jax CPU build runs single-device matmuls with bf16-operand
    # fast-math by DEFAULT precision, while multi-device/shard_map programs
    # compute exact f32 — pin both sides to `highest` so the comparison
    # measures the executor, not the backend's fast path.
    with jax.default_matmul_precision("highest"):
        want = jax.jit(enc.apply)(v, x)
        got = encode_image_pipelined(enc, v, x, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)

    # non-periodic pattern is rejected, not silently mis-computed
    from yolo_dbl_tpu.models.sam_pp import _stage_pattern

    bad = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=32, depth=4,
                          num_heads=4, window_size=2,
                          global_attn_indexes=(0, 3), out_chans=16)
    with pytest.raises(ValueError):
        _stage_pattern(bad, 2)


def test_rtdetr_decoder_pipelined_matches_sequential():
    """decode_pipelined == RTDETRDecoder.apply's last-layer outputs on a tiny
    decoder (4 layers, 2 stages x 2 layers) — exercises PYTREE activations
    {tgt, refer, value pyramid} through the executor."""
    n_pipe = 2
    if len(jax.devices("cpu")) < 2 * n_pipe:
        pytest.skip("needs 4 virtual devices")
    from yolo_dbl_tpu.models.rtdetr import RTDETRDecoder
    from yolo_dbl_tpu.models.rtdetr_pp import decode_pipelined

    mesh = _mesh(n_pipe)
    dec = RTDETRDecoder(nc=5, hd=32, nq=16, ndl=4, nh=4, ndp=2)
    feats = [jax.random.normal(jax.random.PRNGKey(i), (4, s, s, 16))
             for i, s in enumerate((8, 4))]
    v = dec.init(jax.random.PRNGKey(9), feats)
    with jax.default_matmul_precision("highest"):
        boxes_seq, scores_seq, _, _ = jax.jit(dec.apply)(v, feats)
        boxes_pp, scores_pp = decode_pipelined(dec, v, feats, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(boxes_pp),
                               np.asarray(boxes_seq[:, -1]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(scores_pp),
                               np.asarray(scores_seq[:, -1]), rtol=2e-5, atol=2e-5)

    with pytest.raises(ValueError):
        decode_pipelined(RTDETRDecoder(ndl=3), v, feats, mesh)


def test_pipeline_jits_and_grads():
    """The executor lives under jit and differentiates (training viability:
    forward value parity is enough to pin; grad just must compile+run)."""
    n_pipe = 2
    if len(jax.devices("cpu")) < 2 * n_pipe:
        pytest.skip("needs 4 virtual devices")
    mesh = _mesh(n_pipe)
    block = TinyBlock()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 32))
    per_stage = [block.init(jax.random.PRNGKey(i), x) for i in range(n_pipe)]
    stacked = stack_stage_params(per_stage)

    @jax.jit
    def loss(params, a):
        out = pipeline_apply(lambda p, z: block.apply(p, z), params, a, mesh,
                             n_micro=2)
        return jnp.mean(out**2)

    val, grads = jax.value_and_grad(loss)(stacked, x)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
