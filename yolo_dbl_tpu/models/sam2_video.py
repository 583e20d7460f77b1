"""SAM2 stateful video predictor: memory bank + object pointers + occlusion.

Equivalent of the reference's SAM2VideoPredictor state machine
(models/sam/predict.py — inference-state dict with per-frame
maskmem_features/obj_ptr, conditioning vs non-conditioning memory split,
num_maskmem FIFO eviction, object-pointer tokens appended to memory keys
and excluded from RoPE, occlusion handling via the mask-score heuristic).

Design: the jittable per-frame compute (encode → condition → decode →
memory-encode) stays inside SAM2Model methods; this class is the host-side
state machine holding the memory bank, exactly as the reference predictor
holds its inference_state. Fixed shapes: the memory bank is padded to
(num_cond + num_maskmem - 1) slots so every tracked frame reuses one
compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sam2 import SAM2Model, build_sam2


@dataclass
class _FrameMemory:
    mem: jnp.ndarray       # (1, g*g, mem_dim)
    pos: jnp.ndarray       # (1, g*g, mem_dim)
    obj_ptr: jnp.ndarray   # (1, ptr_tokens, mem_dim)
    frame_idx: int
    is_cond: bool


@dataclass
class _ObjectState:
    cond: List[_FrameMemory] = field(default_factory=list)     # prompted frames, never evicted
    recent: List[_FrameMemory] = field(default_factory=list)   # FIFO, <= num_maskmem-1
    last_visible_ptr: Optional[jnp.ndarray] = None
    visible: bool = True
    frames_tracked: int = 0


class SAM2VideoPredictor:
    """Streaming multi-frame mask tracking.

    >>> vp = SAM2VideoPredictor(size='t', image_size=256)
    >>> vp.add_new_points(obj_id=1, frame=f0, points=[[100, 120]], labels=[1])
    >>> for f in frames:  mask, score, visible = vp.track(1, f)
    """

    def __init__(self, size: str = "t", image_size: int = 1024,
                 model: Optional[SAM2Model] = None, variables=None,
                 num_maskmem: int = 7, max_obj_ptrs: int = 16,
                 occlusion_thresh: float = 0.0, rng=None, dtype=jnp.float32):
        self.model = model or build_sam2(size, image_size=image_size, dtype=dtype)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            variables = self.model.init(
                rng, jnp.zeros((1, image_size, image_size, 3), dtype))
        self.variables = variables
        self.image_size = self.model.image_size
        self.num_maskmem = int(num_maskmem)
        self.max_obj_ptrs = int(max_obj_ptrs)
        self.occlusion_thresh = float(occlusion_thresh)
        self.mem_dim = self.model.mem_dim
        self.objects: Dict[int, _ObjectState] = {}
        self._jit_cache: Dict[Tuple, object] = {}

    # ------------------------------------------------------------- jit cores
    def _encode_image(self, frame):
        fn = self._jit_cache.get("enc")
        if fn is None:
            fn = jax.jit(lambda v, x: self.model.apply(v, x, method=SAM2Model.encode_image))
            self._jit_cache["enc"] = fn
        return fn(self.variables, frame)

    def _decode(self, src, points=None, labels=None, high_res=None):
        """→ (masks, iou, sam_tokens_out, object_score_logits)."""
        key = ("dec", points is None or np.asarray(points).shape, high_res is None)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda v, s, p, l, hr: self.model.apply(
                v, s, p, l, method=SAM2Model.decode_masks, multimask_output=False,
                high_res_features=hr))
            self._jit_cache[key] = fn
        return fn(self.variables, src,
                  None if points is None else jnp.asarray(points, jnp.float32)[None],
                  None if labels is None else jnp.asarray(labels, jnp.int32)[None],
                  high_res)

    def _encode_memory(self, src, mask_logits):
        fn = self._jit_cache.get("memenc")
        if fn is None:
            fn = jax.jit(lambda v, s, m: self.model.apply(
                v, s, m, method=SAM2Model.encode_memory))
            self._jit_cache["memenc"] = fn
        return fn(self.variables, src, mask_logits)

    def _condition(self, src, vision_pos, memories, memory_pos, n_ptr):
        key = ("cond", memories.shape[1], n_ptr)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda v, s, vp, m, mp: self.model.apply(
                v, s, vp, m, mp, num_obj_ptr_tokens=n_ptr,
                method=SAM2Model.condition_on_memory))
            self._jit_cache[key] = fn
        return fn(self.variables, src, vision_pos, memories, memory_pos)

    # --------------------------------------------------------------- helpers
    def _prep(self, frame) -> jnp.ndarray:
        f = np.asarray(frame)
        if f.ndim == 3:
            f = f[None]
        if f.shape[1] != self.image_size:
            f = jax.image.resize(
                jnp.asarray(f, jnp.float32),
                (f.shape[0], self.image_size, self.image_size, f.shape[-1]), "bilinear")
        if np.asarray(f).max() > 2.0:
            f = jnp.asarray(f, jnp.float32) / 255.0
        return jnp.asarray(f, jnp.float32)

    def _obj_ptr(self, sam_tokens, obj_logits) -> jnp.ndarray:
        """SAM output token → learned pointer projection with occlusion
        handling (SAM2Model.project_obj_ptr), split into mem_dim tokens
        (reference sam.py obj_ptrs reshape to C // mem_dim tokens)."""
        fn = self._jit_cache.get("optr")
        if fn is None:
            fn = jax.jit(lambda v, t, o: self.model.apply(
                v, t, o, method=SAM2Model.project_obj_ptr))
            self._jit_cache["optr"] = fn
        ptr = fn(self.variables, sam_tokens[:, 0], obj_logits)  # (B, 256)
        b, c = ptr.shape
        return ptr.reshape(b, c // self.mem_dim, self.mem_dim)

    def _frame_memory(self, src, mask_logits, obj_ptr, frame_idx, is_cond) -> _FrameMemory:
        mem, mpos = self._encode_memory(src, mask_logits)
        b, g, _, d = mem.shape
        return _FrameMemory(
            mem=mem.reshape(b, g * g, d),
            pos=jnp.broadcast_to(mpos.reshape(1, g * g, d), (b, g * g, d)),
            obj_ptr=obj_ptr,
            frame_idx=frame_idx, is_cond=is_cond)

    def _bank(self, state: _ObjectState):
        """Concatenate cond + recent memories and pointer tokens."""
        frames = state.cond + state.recent
        mems = jnp.concatenate([f.mem for f in frames], axis=1)
        poss = jnp.concatenate([f.pos for f in frames], axis=1)
        ptr_frames = frames[-self.max_obj_ptrs:]
        ptrs = jnp.concatenate([f.obj_ptr for f in ptr_frames], axis=1)
        ptr_pos = jnp.zeros_like(ptrs)
        memories = jnp.concatenate([mems, ptrs], axis=1)
        memory_pos = jnp.concatenate([poss, ptr_pos], axis=1)
        return memories, memory_pos, ptrs.shape[1]

    # ------------------------------------------------------------ public API
    def add_new_points(self, obj_id: int, frame, points, labels, frame_idx: int = 0):
        """Prompt an object on a conditioning frame; returns (mask, score).

        mask is (H, W) logits at a quarter of the model resolution scaled
        back to the input frame size; score is the decoder's IoU estimate.
        """
        x = self._prep(frame)
        enc = self._encode_image(x)
        src = enc["vision_features"]
        # prompted frames have no memory yet: add no_mem_embed directly
        # (reference sam.py _prepare_memory_conditioned_features,
        # directly_add_no_mem_embed=True)
        no_mem = self.variables["params"]["no_mem_embed"]
        src_dec = src + no_mem[0]
        # _prep resizes to a square, so prompt (x, y) scale per-axis:
        # x by image_size/W, y by image_size/H (frame is HWC or BHWC)
        fh, fw = np.asarray(frame).shape[-3:-1]
        pts = np.asarray(points, np.float32) * np.array(
            [self.image_size / fw, self.image_size / fh], np.float32)
        masks, iou, sam_tokens, obj_logits = self._decode(
            src_dec, pts, np.asarray(labels, np.int32),
            high_res=tuple(enc["backbone_fpn"][:2]))
        mask_logits = self._upmask(masks)
        obj_ptr = self._obj_ptr(sam_tokens, obj_logits)
        state = self.objects.setdefault(obj_id, _ObjectState())
        state.cond.append(self._frame_memory(src, mask_logits, obj_ptr, frame_idx, True))
        state.last_visible_ptr = state.cond[-1].obj_ptr
        return np.asarray(mask_logits[0, ..., 0]), float(iou.max())

    def _upmask(self, masks) -> jnp.ndarray:
        """(B, 1, 4g, 4g) decoder masks → (B, S, S, 1) logits at model res."""
        m = jnp.transpose(masks, (0, 2, 3, 1))
        return jax.image.resize(
            m, (m.shape[0], self.image_size, self.image_size, 1), "bilinear")

    def track(self, obj_id: int, frame, frame_idx: Optional[int] = None):
        """Track the object into a new frame: condition on the memory bank,
        decode without prompts, update the bank (FIFO eviction, occlusion
        gating). Returns (mask_logits (H,W), score, visible)."""
        state = self.objects[obj_id]
        x = self._prep(frame)
        enc = self._encode_image(x)
        src = enc["vision_features"]
        vision_pos = enc["vision_pos_enc"][-1]

        memories, memory_pos, n_ptr = self._bank(state)
        cond_src = self._condition(src, vision_pos, memories, memory_pos, n_ptr)
        masks, iou, sam_tokens, obj_logits = self._decode(
            cond_src, high_res=tuple(enc["backbone_fpn"][:2]))
        score = float(iou.max())
        # occlusion = learned object-score head (reference sam.py
        # pred_obj_scores: is_obj_appearing = object_score_logits > 0)
        visible = float(obj_logits.max()) > self.occlusion_thresh
        mask_logits = self._upmask(masks)
        if not visible:
            # occlusion: suppress the mask and do NOT pollute the memory bank
            # (reference predict.py object-score gating); the object pointer
            # from the last visible frame keeps identity alive
            mask_logits = jnp.full_like(mask_logits, -10.0)
        idx = frame_idx if frame_idx is not None else state.frames_tracked + 1
        if visible:
            obj_ptr = self._obj_ptr(sam_tokens, obj_logits)
            state.recent.append(self._frame_memory(src, mask_logits, obj_ptr, idx, False))
            if len(state.recent) > self.num_maskmem - 1:
                state.recent.pop(0)
            state.last_visible_ptr = state.recent[-1].obj_ptr
        state.visible = visible
        state.frames_tracked += 1
        return np.asarray(mask_logits[0, ..., 0]), score, visible

    def propagate_in_video(self, obj_id: int, frames):
        """Generator over (frame_idx, mask, score, visible) for a frame
        sequence (reference propagate_in_video)."""
        for i, f in enumerate(frames):
            mask, score, visible = self.track(obj_id, f, frame_idx=i + 1)
            yield i, mask, score, visible

    def reset_state(self):
        self.objects.clear()
