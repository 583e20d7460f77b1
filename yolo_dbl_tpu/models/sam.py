"""SAM — Segment Anything (NHWC, flax).

Reference parity: models/sam/modules/{encoders.py ImageEncoderViT /
PromptEncoder, decoders.py MaskDecoder, transformer.py TwoWayTransformer,
sam.py:27 SAMModel} and the predictor flow (models/sam/predict.py). Weights
ship as downloads upstream — unavailable zero-egress — so this module covers
the full architecture, the promptable predictor, and the auto-mask grid
("segment everything") path with random init or converted checkpoints.
SAM2's video memory attention is not modeled (round 3 candidate).

Sizes (build.py): ViT-B (768, 12, 12, [2,5,8,11]), ViT-L (1024, 24, 16,
[5,11,17,23]), ViT-H (1280, 32, 16, [7,15,23,31]).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class LayerNorm2d(nn.Module):
    """Channel LayerNorm for NHWC maps (reference blocks.py LayerNorm2d)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        u = x.mean(-1, keepdims=True)
        s = ((x - u) ** 2).mean(-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + 1e-6)
        return x * self.param("weight", nn.initializers.ones, (c,)) + self.param(
            "bias", nn.initializers.zeros, (c,))


def _rel_bias(q_hw, k_hw, rel_h, rel_w, q):
    """Decomposed relative position bias (reference utils.py:232
    add_decomposed_rel_pos), q_size == k_size (SAM encoder invariant)."""
    qh, qw = q_hw
    kh, kw = k_hw
    coords_q = jnp.arange(qh)[:, None]
    coords_k = jnp.arange(kh)[None, :]
    rh = rel_h[(coords_q - coords_k) + (kh - 1)]  # (qh, kh, C)
    coords_q = jnp.arange(qw)[:, None]
    coords_k = jnp.arange(kw)[None, :]
    rw = rel_w[(coords_q - coords_k) + (kw - 1)]  # (qw, kw, C)
    b = q.shape[0]
    r_q = q.reshape(b, qh, qw, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)  # (B, qh, qw, kh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)  # (B, qh, qw, kw)
    return (bias_h[..., :, None] + bias_w[..., None, :]).reshape(b, qh * qw, kh * kw)


class _ViTAttention(nn.Module):
    """Multi-head attention with decomposed relative positions
    (reference blocks.py Attention / REAttention)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (64, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = (t.reshape(b * nh, h * w, hd) for t in (qkv[0], qkv[1], qkv[2]))
        attn = (q * hd**-0.5) @ k.swapaxes(-1, -2)  # (B·nh, hw, hw)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, hd))
            attn = attn + _rel_bias((h, w), (h, w), rel_h, rel_w, q)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(b, nh, h * w, hd).transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _ViTBlock(nn.Module):
    """Transformer block with optional window attention (encoders.py Block)."""

    dim: int
    num_heads: int
    window_size: int = 0
    input_size: Tuple[int, int] = (64, 64)
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)  # torch partial(LN, eps=1e-6) in _build_sam
        ws = self.window_size
        if ws > 0:
            ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hp, wp = h + ph, w + pw
            y = y.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(-1, ws, ws, c)
            asize = (ws, ws)
        else:
            asize = (h, w)
        y = _ViTAttention(self.dim, self.num_heads, input_size=asize,
                          dtype=self.dtype, name="attn")(y)
        if ws > 0:
            y = y.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, hp, wp, c)[:, :h, :w]
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_lin1")(z)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_lin2")(nn.gelu(z))
        return x + z


class ImageEncoderViT(nn.Module):
    """SAM ViT image encoder (encoders.py:17): 16×16 patch embed, abs pos,
    windowed blocks with periodic global attention, 256-channel neck."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    out_chans: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
                    padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, self.embed_dim))
        x = x + pos
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = _ViTBlock(self.embed_dim, self.num_heads, ws, (g, g),
                          dtype=self.dtype, name=f"block{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_conv2")(x)
        return LayerNorm2d(dtype=self.dtype, name="neck_ln2")(x)


class PromptEncoder(nn.Module):
    """SAM prompt encoder (encoders.py:217): random-Fourier positional
    encoding + learned point/box/mask embeddings."""

    embed_dim: int = 256
    image_embedding_size: int = 64
    input_image_size: int = 1024
    mask_in_chans: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        # fixed random projection — a registered BUFFER upstream, not a param;
        # lives in a "buffers" collection (keeps param counts at exact parity)
        # so checkpoint porting (sam_port.py) can install the torch matrix.
        self._pe_gaussian = self.variable(
            "buffers", "pe_gaussian",
            lambda: jnp.asarray(
                np.random.default_rng(0).standard_normal((2, self.embed_dim // 2)),
                jnp.float32,
            ),
        )
        # [neg point, pos point, box tl, box br], + not_a_point
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        c = self.mask_in_chans
        self.mask_conv1 = nn.Conv(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype)
        self.mask_ln1 = LayerNorm2d(dtype=self.dtype)
        self.mask_conv2 = nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.dtype)
        self.mask_ln2 = LayerNorm2d(dtype=self.dtype)
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)

    def _pe(self, coords):
        """coords in [0, 1] → Fourier features (encoders.py PositionEmbeddingRandom)."""
        c = 2 * coords - 1
        c = c @ self._pe_gaussian.value * (2 * jnp.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self):
        g = self.image_embedding_size
        ys = (jnp.arange(g) + 0.5) / g
        xs = (jnp.arange(g) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # (g, g, 2) xy
        return self._pe(grid)  # (g, g, C)

    def __call__(self, points=None, labels=None, boxes=None, masks=None, batch=1):
        """points (B, N, 2) px, labels (B, N) {1 pos, 0 neg, -1 pad};
        boxes (B, M, 4) xyxy px; masks (B, 256, 256, 1) logits."""
        sparse = jnp.zeros((batch, 0, self.embed_dim))
        if points is not None:
            if boxes is None:
                # pad with an empty point (label -1 → not_a_point embed),
                # reference encoders.py:281-285 (_embed_points pad=True)
                points = jnp.concatenate(
                    [points, jnp.zeros((points.shape[0], 1, 2), points.dtype)], axis=1)
                labels = jnp.concatenate(
                    [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1)
            # +0.5 shifts to pixel centers (reference encoders.py:280)
            pts = (points + 0.5) / self.input_image_size
            pe = self._pe(pts)
            lab = labels[..., None]
            pe = jnp.where(lab == -1, self.not_a_point_embed[0], pe + jnp.where(
                lab == 1, self.point_embeddings[1], self.point_embeddings[0]))
            sparse = jnp.concatenate([sparse, pe], axis=1)
        if boxes is not None:
            corners = (boxes.reshape(boxes.shape[0], -1, 2, 2) + 0.5) / self.input_image_size
            pe = self._pe(corners)
            pe = pe + jnp.stack([self.point_embeddings[2], self.point_embeddings[3]])
            sparse = jnp.concatenate([sparse, pe.reshape(pe.shape[0], -1, self.embed_dim)], axis=1)
        g = self.image_embedding_size
        if masks is None:  # materialize the branch params like torch registers them
            masks_in = jnp.zeros((batch, 4 * g, 4 * g, 1))
        else:
            masks_in = masks
        d = self.mask_conv1(masks_in)
        d = nn.gelu(self.mask_ln1(d))
        d = self.mask_conv2(d)
        d = nn.gelu(self.mask_ln2(d))
        mask_dense = self.mask_conv3(d)
        if masks is not None:
            dense = mask_dense
        else:
            dense = jnp.broadcast_to(self.no_mask_embed.reshape(1, 1, 1, -1),
                                     (batch, g, g, self.embed_dim))
        return sparse, dense


class _PromptAttention(nn.Module):
    """Downsampled attention for the two-way transformer (transformer.py:300)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embedding_dim // self.downsample_rate
        hd = d // self.num_heads
        qp = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)
        b = qp.shape[0]
        qp = qp.reshape(b, -1, self.num_heads, hd)
        kp = kp.reshape(b, -1, self.num_heads, hd)
        vp = vp.reshape(b, -1, self.num_heads, hd)
        attn = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", qp / jnp.sqrt(hd), kp), -1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(b, -1, d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayTransformer(nn.Module):
    """Bidirectional token↔image transformer (transformer.py:12)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(1, h * w, c)
        queries = point_embedding
        for i in range(self.depth):
            # self-attention on tokens (first layer skips pe add)
            if i == 0:
                q = _PromptAttention(c, self.num_heads, dtype=self.dtype,
                                     name=f"l{i}_self")(queries, queries, queries)
                queries = q
            else:
                qpe = queries + point_embedding
                queries = queries + _PromptAttention(
                    c, self.num_heads, dtype=self.dtype, name=f"l{i}_self")(qpe, qpe, queries)
            queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm1")(queries)
            # token → image
            queries = queries + _PromptAttention(
                c, self.num_heads, 2, dtype=self.dtype, name=f"l{i}_t2i")(
                queries + point_embedding, keys + key_pe, keys)
            queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm2")(queries)
            # mlp
            m = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"l{i}_mlp1")(queries)
            m = nn.Dense(c, dtype=self.dtype, name=f"l{i}_mlp2")(nn.relu(m))
            queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm3")(queries + m)
            # image → token
            keys = keys + _PromptAttention(
                c, self.num_heads, 2, dtype=self.dtype, name=f"l{i}_i2t")(
                keys + key_pe, queries + point_embedding, queries)
            keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm4")(keys)
        queries = queries + _PromptAttention(
            c, self.num_heads, 2, dtype=self.dtype, name="final_t2i")(
            queries + point_embedding, keys + key_pe, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """SAM mask decoder (decoders.py:10): output tokens + two-way transformer
    + hypernetwork mask heads + IoU prediction."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = True):
        c = self.transformer_dim
        nm = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, c))
        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], 0)[None], (b, 1 + nm, c))
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt  # (B, g, g, C)
        hs, keys = TwoWayTransformer(dtype=self.dtype, name="transformer")(
            src, image_pe[None], tokens)
        iou_tok = hs[:, 0]
        mask_toks = hs[:, 1:1 + nm]

        g = src.shape[1]
        up = keys.reshape(b, g, g, c)
        up = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upscale_conv1")(up)
        up = nn.gelu(LayerNorm2d(dtype=self.dtype, name="upscale_ln")(up))
        up = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upscale_conv2")(up)
        up = nn.gelu(up)  # (B, 4g, 4g, C/8)

        hyper = []
        for i in range(nm):
            t = mask_toks[:, i]
            for j in range(2):
                t = nn.relu(nn.Dense(c, dtype=self.dtype, name=f"hyper{i}_fc{j}")(t))
            hyper.append(nn.Dense(c // 8, dtype=self.dtype, name=f"hyper{i}_fc2")(t))
        hyper = jnp.stack(hyper, axis=1)  # (B, nm, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)  # (B, nm, 4g, 4g)

        t = iou_tok
        for j in range(self.iou_head_depth - 1):
            t = nn.relu(nn.Dense(self.iou_head_hidden, dtype=self.dtype, name=f"iou_fc{j}")(t))
        iou_pred = nn.Dense(nm, dtype=self.dtype, name="iou_out")(t)

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


class SAMModel(nn.Module):
    """Full promptable segmentation model (reference sam.py:27)."""

    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    img_size: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        g = self.img_size // 16
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size, embed_dim=self.encoder_embed_dim,
            depth=self.encoder_depth, num_heads=self.encoder_num_heads,
            global_attn_indexes=self.encoder_global_attn_indexes, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=g, input_image_size=self.img_size, dtype=self.dtype)
        self.mask_decoder = MaskDecoder(dtype=self.dtype)

    def encode_image(self, x):
        return self.image_encoder(x)

    def __call__(self, image, points=None, labels=None, boxes=None,
                 multimask_output: bool = True):
        emb = self.image_encoder(image)
        sparse, dense = self.prompt_encoder(points, labels, boxes, batch=image.shape[0])
        return self.mask_decoder(emb, self.prompt_encoder.dense_pe(), sparse,
                                 dense, multimask_output)

    def prompt(self, image_embeddings, points=None, labels=None, boxes=None,
               multimask_output: bool = True):
        """Decode prompts against precomputed embeddings (predict.py flow)."""
        b = image_embeddings.shape[0]
        sparse, dense = self.prompt_encoder(points, labels, boxes, batch=b)
        return self.mask_decoder(image_embeddings, self.prompt_encoder.dense_pe(),
                                 sparse, dense, multimask_output)


def build_sam(size: str = "b", img_size: int = 1024, dtype=jnp.float32) -> SAMModel:
    """SAM ViT-B/L/H configurations (reference sam/build.py)."""
    cfgs = {
        "b": (768, 12, 12, (2, 5, 8, 11)),
        "l": (1024, 24, 16, (5, 11, 17, 23)),
        "h": (1280, 32, 16, (7, 15, 23, 31)),
    }
    d, depth, heads, gi = cfgs[size]
    return SAMModel(encoder_embed_dim=d, encoder_depth=depth, encoder_num_heads=heads,
                    encoder_global_attn_indexes=gi, img_size=img_size, dtype=dtype)


class SAMPredictor:
    """Stateful prompting facade (reference models/sam/predict.py Predictor):
    `set_image` embeds once, then any number of `predict` calls with
    point/box prompts in ORIGINAL image pixel coordinates."""

    def __init__(self, model: SAMModel, variables):
        self.model = model
        self.variables = variables
        self._embed = None
        self._scale = 1.0
        self._orig_hw = None
        self._jit_encode = jax.jit(
            lambda v, x: model.apply(v, x, method="encode_image"))

    def set_image(self, image: np.ndarray):
        """image: HWC uint8/float RGB at any size; resized longest-side to
        the model's img_size and zero-padded bottom/right."""
        import cv2

        h0, w0 = image.shape[:2]
        s = self.model.img_size
        self._scale = s / max(h0, w0)
        nh, nw = round(h0 * self._scale), round(w0 * self._scale)
        im = cv2.resize(np.asarray(image), (nw, nh)).astype(np.float32)
        if im.max() > 1.5:
            im = im / 255.0
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = im
        self._orig_hw = (h0, w0)
        self._embed = self._jit_encode(self.variables, jnp.asarray(canvas)[None])
        return self

    def predict(self, points=None, labels=None, boxes=None, multimask_output=True):
        """Prompts in original-image pixels → (masks (N, h0, w0), iou (N,))."""
        assert self._embed is not None, "call set_image first"
        kw = {}
        if points is not None:
            pts = jnp.asarray(points, jnp.float32).reshape(1, -1, 2) * self._scale
            lab = (jnp.asarray(labels).reshape(1, -1) if labels is not None
                   else jnp.ones((1, pts.shape[1]), jnp.int32))
            kw.update(points=pts, labels=lab)
        if boxes is not None:
            kw["boxes"] = jnp.asarray(boxes, jnp.float32).reshape(1, -1, 4) * self._scale
        masks, iou = self.model.apply(self.variables, self._embed,
                                      multimask_output=multimask_output,
                                      method="prompt", **kw)
        # low-res (img/4) logits → original resolution
        n = masks.shape[1]
        s = self.model.img_size
        up = jax.image.resize(masks[0], (n, s, s), "bilinear")
        h0, w0 = self._orig_hw
        nh, nw = round(h0 * self._scale), round(w0 * self._scale)
        up = up[:, :nh, :nw]
        up = jax.image.resize(up, (n, h0, w0), "bilinear")
        return np.asarray(up > 0), np.asarray(iou[0])
